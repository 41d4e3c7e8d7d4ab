"""query_pool="mean": length-masked mean over LSTM hidden states as the
query sentence representation (ModelConfig.query_pool; the MCN-lineage
default stays "last").  Correctness hinges on two things this file pins:
the mask (hs at t >= length holds the FROZEN carry, not zeros) and the
fused custom-VJP carrying the d(hs) cotangent."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfr_tpu.config import DataConfig, ExperimentConfig, ModelConfig
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import (
    _query_hidden,
    embed_queries,
    init_model_params,
)
from vfr_tpu.ops.lstm import lstm_forward

F, E, H = 16, 8, 12


def _setup(query_pool="mean", rnn_cell="lstm", train_rnn_impl="scan"):
    cfg = ExperimentConfig(
        name="t",
        data=DataConfig(feature_dim=F, glove_dim=E, use_flow=False),
        model=ModelConfig(joint_dim=8, lstm_hidden=H, rnn_cell=rnn_cell,
                          query_pool=query_pool, use_pallas="never",
                          train_rnn_impl=train_rnn_impl,
                          stream_weights=(1.0,)),
    )
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    glove = rng.standard_normal((32, E)).astype(np.float32)
    params = init_model_params(jax.random.PRNGKey(0), model, glove, F)
    tokens = jnp.asarray(rng.integers(1, 32, size=(5, 7)), jnp.int32)
    lengths = jnp.asarray([1, 3, 7, 4, 2], jnp.int32)
    return model, params, tokens, lengths


def test_mean_pool_is_masked_mean_of_scan_states():
    model, params, tokens, lengths = _setup()
    got = np.asarray(_query_hidden(params, model, tokens, lengths,
                                   inference=False))
    x = jnp.take(params["embeddings"], tokens, axis=0)
    _, hs = lstm_forward(params["lstm"], x, lengths)
    hs = np.asarray(hs)
    for b in range(5):
        L = int(lengths[b])
        np.testing.assert_allclose(got[b], hs[b, :L].mean(0),
                                   rtol=1e-5, atol=1e-6)


def test_mask_matters_frozen_carry_would_leak():
    """The unmasked mean differs whenever a sequence is shorter than T —
    proves the mask is load-bearing (hs carries the frozen h past the
    length, not zeros)."""
    model, params, tokens, lengths = _setup()
    got = np.asarray(_query_hidden(params, model, tokens, lengths,
                                   inference=False))
    x = jnp.take(params["embeddings"], tokens, axis=0)
    _, hs = lstm_forward(params["lstm"], x, lengths)
    unmasked = np.asarray(hs).mean(1)
    # b=1 has length 3 of T=7: the frozen tail repeats hs[2] four times,
    # so the unmasked mean over-weights the last state (for a LENGTH-1
    # sequence the two coincide — every frozen step equals hs[0])
    assert not np.allclose(got[1], unmasked[1])
    np.testing.assert_allclose(got[0], unmasked[0], rtol=1e-6)


@pytest.mark.parametrize("cell", ["lstm", "gru"])
def test_fused_grads_match_scan_with_mean_pool(cell):
    """The fused custom-VJP must carry the d(hs) cotangent the mean pool
    introduces: gradients of a mean-pooled loss through the fused trunk
    must match plain scan autodiff."""
    model_s, params, tokens, lengths = _setup(rnn_cell=cell,
                                              train_rnn_impl="scan")
    model_f, _, _, _ = _setup(rnn_cell=cell, train_rnn_impl="fused")

    def loss(p, model):
        q = embed_queries(p, model, tokens, lengths, inference=False)
        return jnp.sum(q * q)

    g_scan = jax.grad(lambda p: loss(p, model_s))(params)
    g_fused = jax.grad(lambda p: loss(p, model_f))(params)
    for a, b in zip(jax.tree.leaves(g_scan), jax.tree.leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_pallas_inference_path_matches_scan_mean_pool():
    """Serving (use_pallas policy) with mean pooling == the scan twin.
    On this CPU harness pallas runs interpreted; the parity that matters
    is hs + mask semantics across implementations."""
    model, params, tokens, lengths = _setup()
    ref = np.asarray(embed_queries(params, model, tokens, lengths,
                                   inference=True, rnn_kernel="scan"))
    cfgp = dataclasses.replace(model.cfg, use_pallas="always")
    model_p = model._replace(cfg=cfgp)   # Model is a NamedTuple
    got = np.asarray(embed_queries(params, model_p, tokens, lengths,
                                   inference=True, rnn_kernel="pallas"))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_attn_pool_at_init_equals_mean_pool():
    """query_attn is ZERO-initialized: uniform masked softmax == the
    masked mean, so attn training starts from the measured-best fixed
    pool and only departs if gradients move the scoring vector."""
    model_a, params_a, tokens, lengths = _setup(query_pool="attn")
    model_m, params_m, _, _ = _setup(query_pool="mean")
    got = np.asarray(_query_hidden(params_a, model_a, tokens, lengths,
                                   inference=False))
    ref = np.asarray(_query_hidden(params_m, model_m, tokens, lengths,
                                   inference=False))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_attn_pool_masks_frozen_tail():
    """A nonzero scoring vector must not attend past the length: states
    at t >= length (frozen carry) change nothing even when their scores
    would dominate the softmax."""
    model, params, tokens, lengths = _setup(query_pool="attn")
    params = dict(params)
    rng = np.random.default_rng(1)
    params["query_attn"] = jnp.asarray(
        rng.standard_normal(H).astype(np.float32) * 5.0)
    base = np.asarray(_query_hidden(params, model, tokens, lengths,
                                    inference=False))
    # shuffle the PADDING tokens (b=1 has length 3 of T=7); live prefix
    # unchanged -> pooled representation must be identical
    t2 = np.asarray(tokens).copy()
    t2[1, 3:] = (t2[1, 3:] + 7) % 31 + 1
    got = np.asarray(_query_hidden(params, model, jnp.asarray(t2), lengths,
                                   inference=False))
    np.testing.assert_allclose(got[1], base[1], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("cell", ["lstm", "gru"])
def test_attn_pool_grad_reaches_scoring_vector(cell):
    """The scoring vector must receive gradient through the softmax (at
    zero init the weights are uniform but d(loss)/d(query_attn) != 0
    whenever states differ), and the fused trunk must carry the d(hs)
    cotangent exactly like scan."""
    model_s, params, tokens, lengths = _setup(query_pool="attn",
                                              rnn_cell=cell,
                                              train_rnn_impl="scan")
    model_f, _, _, _ = _setup(query_pool="attn", rnn_cell=cell,
                              train_rnn_impl="fused")

    def loss(p, model):
        q = embed_queries(p, model, tokens, lengths, inference=False)
        return jnp.sum(q * q)

    g_scan = jax.grad(lambda p: loss(p, model_s))(params)
    assert float(jnp.abs(g_scan["query_attn"]).max()) > 0.0
    g_fused = jax.grad(lambda p: loss(p, model_f))(params)
    for a, b in zip(jax.tree.leaves(g_scan), jax.tree.leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_unknown_query_pool_rejected():
    model, params, tokens, lengths = _setup(query_pool="attention")
    with pytest.raises(ValueError, match="query_pool"):
        _query_hidden(params, model, tokens, lengths, inference=False)


def test_train_loop_with_mean_pool(tmp_path):
    from vfr_tpu.config import EvalConfig, TrainConfig
    from vfr_tpu.train.loop import train

    cfg = ExperimentConfig(
        name="t",
        data=DataConfig(data_dir=str(tmp_path / "x"), feature_dim=F,
                        glove_dim=E, use_flow=False,
                        synthetic_num_videos=8, synthetic_num_queries=32),
        model=ModelConfig(joint_dim=8, lstm_hidden=H, query_pool="mean",
                          stream_weights=(1.0,)),
        train=TrainConfig(batch_size=8, num_epochs=3, learning_rate=3e-3,
                          checkpoint_dir=str(tmp_path / "ck")),
        eval=EvalConfig(eval_batch_size=16),
    )
    _, metrics = train(cfg)
    assert np.isfinite(metrics["mIoU"])
