"""Stage-gate (kept post-registration): the streaming pipeline twin
(score-on-ingest, select-at-snapshot) is bit-identical to the one-shot
batch composition — what lets it share corpus_pipeline_served's spliced
oracle."""

from udacity_dend_capstone_immigration_spark.workload import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_streamed_pipeline_equals_one_shot(spark):
    batch = sorted(
        map(tuple, QUERIES["corpus_pipeline_served"](spark, SF_DIR).collect())
    )
    streamed = sorted(
        map(tuple, QUERIES["corpus_pipeline_streamed"](spark, SF_DIR).collect())
    )
    assert streamed == batch
    assert len(streamed) > 0
