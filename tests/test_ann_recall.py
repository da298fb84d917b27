"""ANN recall against the exact top-k baseline: the three LSH variants must
rank in their theoretical recall order (single-probe < multi-probe <
multi-table OR-construction), and the multi-table index must clear an
absolute floor for this data's similarity regime."""

from __future__ import annotations

import pytest

from stock_etl_pipeline_spark.workload import load_all

SF = "/root/testdata/sf0.01"
REGISTRY = load_all()


@pytest.fixture(scope="module")
def recalls(spark):
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in REGISTRY["embedding_topk"].fn(spark, SF).collect()
    }

    def recall(name: str) -> float:
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in REGISTRY[name].fn(spark, SF).collect()
        }
        return len(exact & approx) / len(exact)

    return {
        "single": recall("embedding_ann_lsh"),
        "multiprobe": recall("embedding_ann_multiprobe"),
        "multitable": recall("embedding_ann_multitable"),
        "ivf": recall("embedding_ivf_topk"),
        "ivf_pq": recall("embedding_ivf_pq"),
    }


def test_recall_ordering(recalls):
    assert recalls["single"] <= recalls["multiprobe"] <= recalls["multitable"]


def test_multitable_recall_floor(recalls):
    # 8 tables × 5 bits at this corpus's neighbor-similarity regime: the
    # OR-construction must recover a substantial fraction of true top-10.
    assert recalls["multitable"] >= 0.4, recalls


def test_ivf_beats_lsh_on_clustered_data(recalls):
    # Data-adaptive k-means cells align with the corpus's cluster structure;
    # data-oblivious hyperplanes can't — IVF should dominate every LSH
    # variant here (measured ≈ 0.9 at sf0.01).
    assert recalls["ivf"] >= 0.8, recalls
    assert recalls["ivf"] > recalls["multitable"]


def test_ivf_pq_recall_close_to_ivf(recalls):
    # PQ compresses the residuals (8 subspaces x 16 codes) and re-ranks a 3k
    # shortlist exactly, so it may drop a few tail neighbors vs uncompressed
    # IVF but must stay close (and far above chance).
    assert recalls["ivf_pq"] >= recalls["ivf"] - 0.2, recalls
    assert recalls["ivf_pq"] >= 0.6, recalls
