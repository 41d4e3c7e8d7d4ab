"""Length-bucketed serving (eval/corpus.py serve_queries length_buckets):
queries grouped by token length, each group dispatched with the sequence
axis sliced to its bucket.  The contract under test is BIT-IDENTICAL
results vs the unbucketed path — sliced steps are frozen-carry no-ops for
every row in the bucket, and encode/score/top-k are all row-independent.
"""

import jax
import numpy as np
import pytest

from vfr_tpu.config import (
    DataConfig,
    EvalConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from vfr_tpu.data.didemo import DidemoDataset
from vfr_tpu.data.glove import Vocab
from vfr_tpu.data.synthetic import make_didemo_fixture
from vfr_tpu.eval.corpus import resolve_length_buckets, serve_queries
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import init_model_params

F, E = 16, 8


class TestResolveBuckets:
    def test_off(self):
        assert resolve_length_buckets(None, 24) is None
        assert resolve_length_buckets("", 24) is None

    def test_auto(self):
        assert resolve_length_buckets("auto", 24) == (8, 16, 24)
        assert resolve_length_buckets("auto", 20) == (8, 16, 20)

    def test_explicit_string_and_sequence(self):
        assert resolve_length_buckets("8,16", 24) == (8, 16, 24)
        assert resolve_length_buckets([16, 8], 24) == (8, 16, 24)

    def test_caps_at_max_query_len(self):
        # oversized and duplicate buckets collapse; terminal bucket is
        # always max_query_len so every query routes somewhere
        assert resolve_length_buckets("8,99", 24) == (8, 24)
        assert resolve_length_buckets("24", 24) == (24,)


def _build(query_pool="last"):
    fix = make_didemo_fixture(num_videos=12, num_queries=48, feature_dim=F,
                              glove_dim=E, seed=7)
    cfg = ExperimentConfig(
        name="t",
        data=DataConfig(feature_dim=F, glove_dim=E, use_flow=True),
        model=ModelConfig(joint_dim=16, lstm_hidden=16,
                          stream_weights=(0.5, 0.5), query_pool=query_pool),
        train=TrainConfig(),
        eval=EvalConfig(),
    )
    ds = DidemoDataset(fix.annotations, fix.rgb, fix.flow, fix.vocab,
                       cfg.data)
    model = build_model(cfg)
    params = init_model_params(jax.random.PRNGKey(0), model, fix.glove, F)
    vocab = Vocab([f"w{i:04d}" for i in range(50)])
    return model, params, ds, vocab


def _mixed_queries():
    """Lengths 1..6 shuffled — exercises routing to multiple buckets and
    the scatter back to arrival order."""
    rng = np.random.default_rng(3)
    qs = []
    for i in range(17):
        n = 1 + int(rng.integers(0, 6))
        qs.append(" ".join(f"w{int(rng.integers(1, 50)):04d}"
                           for _ in range(n)))
    return qs


@pytest.mark.parametrize("query_pool", ["last", "mean"])
def test_bucketed_equals_unbucketed(query_pool):
    model, params, ds, vocab = _build(query_pool)
    qs = _mixed_queries()
    # batch_size 8 forces multiple batches per bucket and a ragged tail
    base = serve_queries(params, model, ds, vocab, qs, k=5, batch_size=8)
    bucketed = serve_queries(params, model, ds, vocab, qs, k=5,
                             batch_size=8, length_buckets="2,4")
    assert len(base) == len(bucketed) == len(qs)
    for a, b in zip(base, bucketed):
        assert a["query"] == b["query"]
        for ra, rb in zip(a["results"], b["results"]):
            assert ra["video"] == rb["video"]
            assert ra["start"] == rb["start"] and ra["end"] == rb["end"]
            # bit-identical: the sliced steps were frozen-carry no-ops
            assert ra["distance"] == rb["distance"]


def test_auto_buckets_and_long_queries_route_to_terminal():
    model, params, ds, vocab = _build()
    long_q = " ".join(f"w{i:04d}" for i in range(1, 25))  # len 24 == max
    qs = ["w0001", long_q, "w0002 w0003"]
    base = serve_queries(params, model, ds, vocab, qs, k=3)
    bucketed = serve_queries(params, model, ds, vocab, qs, k=3,
                             length_buckets="auto")
    for a, b in zip(base, bucketed):
        assert [r["distance"] for r in a["results"]] == \
            [r["distance"] for r in b["results"]]


def test_single_bucket_is_unbucketed():
    model, params, ds, vocab = _build()
    qs = ["w0001 w0002", "w0003"]
    base = serve_queries(params, model, ds, vocab, qs, k=3)
    bucketed = serve_queries(params, model, ds, vocab, qs, k=3,
                             length_buckets="24")
    for a, b in zip(base, bucketed):
        assert [r["distance"] for r in a["results"]] == \
            [r["distance"] for r in b["results"]]
