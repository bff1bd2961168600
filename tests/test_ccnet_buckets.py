"""Semantic pin for CCNet perplexity bucketing beyond the oracle hash:
the shaping must be real — every language splits into all three
buckets and mean NLL must strictly increase head → middle → tail."""

from __future__ import annotations

from nyc_taxi_bigdata_pipeline_spark.benchqueries.curation_ops import (
    curation_ccnet_buckets,
)


def test_ccnet_buckets_shape_and_monotonicity(spark, sf_dir):
    rows = curation_ccnet_buckets(spark, sf_dir).collect()
    by_lang: dict[str, dict[str, object]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.bucket] = r
    assert len(by_lang) >= 2
    for lang, buckets in by_lang.items():
        assert set(buckets) == {"head", "middle", "tail"}, lang
        h, m, t = buckets["head"], buckets["middle"], buckets["tail"]
        # terciles: no bucket degenerates to a sliver
        total = h.docs + m.docs + t.docs
        for b in (h, m, t):
            assert b.docs >= total // 5, (lang, b.bucket, b.docs, total)
        # the defining property: perplexity rises along the shaping
        assert h.avg_nll_nats < m.avg_nll_nats < t.avg_nll_nats, lang
