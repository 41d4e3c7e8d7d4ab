"""LSTM over token embeddings — `lax.scan` with batched MXU GEMMs per step.

TPU-first notes (SURVEY.md §7 "hard parts"): recurrences don't batch onto
the MXU across time, but at query scale (T <= ~30, H ~ 1024) one
``[B, E+H] @ [E+H, 4H]`` GEMM per scan step keeps the MXU busy and XLA keeps
the fused weights resident.  Gate layout follows torch's (i, f, g, o) chunk
order so torch-CPU serves as an independent parity oracle
(tests/test_lstm.py).  A Pallas VMEM-resident-weight kernel twin lives in
ops/pallas/lstm_kernel.py; both implementations are interchangeable.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def init_lstm_params(
    rng: jax.Array, input_dim: int, hidden: int, num_layers: int = 1,
    forget_bias: float = 1.0, dtype=jnp.float32,
) -> Dict[str, jnp.ndarray]:
    """Uniform(-k, k) init with k = 1/sqrt(hidden) (torch-compatible)."""
    params = {}
    k = 1.0 / np.sqrt(hidden)
    for layer in range(num_layers):
        in_dim = input_dim if layer == 0 else hidden
        rng, r1, r2, r3 = jax.random.split(rng, 4)
        w_ih = jax.random.uniform(r1, (in_dim, 4 * hidden), dtype, -k, k)
        w_hh = jax.random.uniform(r2, (hidden, 4 * hidden), dtype, -k, k)
        b = jax.random.uniform(r3, (4 * hidden,), dtype, -k, k)
        if forget_bias:
            b = b.at[hidden : 2 * hidden].add(forget_bias)
        params[f"layer{layer}"] = {"w_ih": w_ih, "w_hh": w_hh, "b": b}
    return params


def _cell_step(x_t, h, c, w_ih, w_hh, b, compute_dtype):
    """One LSTM cell step; gates in torch (i, f, g, o) order."""
    H = h.shape[-1]
    gates = (
        jnp.dot(x_t.astype(compute_dtype), w_ih.astype(compute_dtype),
                preferred_element_type=jnp.float32)
        + jnp.dot(h.astype(compute_dtype), w_hh.astype(compute_dtype),
                  preferred_element_type=jnp.float32)
        + b
    )
    i = jax.nn.sigmoid(gates[..., 0 * H : 1 * H])
    f = jax.nn.sigmoid(gates[..., 1 * H : 2 * H])
    g = jnp.tanh(gates[..., 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[..., 3 * H : 4 * H])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def init_gru_params(
    rng: jax.Array, input_dim: int, hidden: int, num_layers: int = 1,
    dtype=jnp.float32,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """GRU params in torch layout: gates (r, z, n); separate b_ih / b_hh
    (the n-gate needs r * (W_hn h + b_hn), so the two biases are NOT
    mergeable — unlike the LSTM)."""
    params = {}
    k = 1.0 / np.sqrt(hidden)
    for layer in range(num_layers):
        in_dim = input_dim if layer == 0 else hidden
        rng, r1, r2, r3, r4 = jax.random.split(rng, 5)
        params[f"layer{layer}"] = {
            "w_ih": jax.random.uniform(r1, (in_dim, 3 * hidden), dtype, -k, k),
            "w_hh": jax.random.uniform(r2, (hidden, 3 * hidden), dtype, -k, k),
            "b_ih": jax.random.uniform(r3, (3 * hidden,), dtype, -k, k),
            "b_hh": jax.random.uniform(r4, (3 * hidden,), dtype, -k, k),
        }
    return params


def _gru_step(x_t, h, w_ih, w_hh, b_ih, b_hh, compute_dtype):
    """One GRU step; torch (r, z, n) gate order and bias semantics."""
    H = h.shape[-1]
    gi = jnp.dot(x_t.astype(compute_dtype), w_ih.astype(compute_dtype),
                 preferred_element_type=jnp.float32) + b_ih
    gh = jnp.dot(h.astype(compute_dtype), w_hh.astype(compute_dtype),
                 preferred_element_type=jnp.float32) + b_hh
    r = jax.nn.sigmoid(gi[..., 0 * H : 1 * H] + gh[..., 0 * H : 1 * H])
    z = jax.nn.sigmoid(gi[..., 1 * H : 2 * H] + gh[..., 1 * H : 2 * H])
    n = jnp.tanh(gi[..., 2 * H : 3 * H] + r * gh[..., 2 * H : 3 * H])
    return (1.0 - z) * n + z * h


def _gru_layer_fused_fwd(x, lengths, w_ih, w_hh, b_ih, b_hh):
    """Fused-layout GRU forward for one layer (mirror of the LSTM variant):
    the input-side projection runs as ONE sequence-sized GEMM; the scan
    carries only the hidden GEMM.  Returns (h_last, hs) plus VJP residuals:
    post-activation gates r/z/n [T, B, 3H] and the hidden-side n-gate
    pre-activation gh_n [T, B, H] (needed for dr — the r-gated term)."""
    B, T, E = x.shape
    H = w_hh.shape[0]
    gi = (
        jnp.einsum("bte,eg->tbg", x, w_ih, preferred_element_type=jnp.float32)
        + b_ih[None, None, :]
    )                                                     # [T, B, 3H]
    h0 = jnp.zeros((B, H), jnp.float32)

    def step(h, inp):
        gi_t, t = inp
        gh = jnp.dot(h, w_hh, preferred_element_type=jnp.float32) + b_hh
        r = jax.nn.sigmoid(gi_t[:, 0 * H : 1 * H] + gh[:, 0 * H : 1 * H])
        z = jax.nn.sigmoid(gi_t[:, 1 * H : 2 * H] + gh[:, 1 * H : 2 * H])
        gh_n = gh[:, 2 * H : 3 * H]
        n = jnp.tanh(gi_t[:, 2 * H : 3 * H] + r * gh_n)
        h_new = (1.0 - z) * n + z * h
        live = (t < lengths)[:, None]
        h = jnp.where(live, h_new, h)
        acts = jnp.concatenate([r, z, n], axis=1)
        return h, (h, acts, gh_n)

    h_fin, (hs, acts, gh_ns) = jax.lax.scan(step, h0, (gi, jnp.arange(T)))
    return h_fin, hs, acts, gh_ns


def _gru_layer_fused_bwd(x, lengths, w_ih, w_hh, hs, acts, gh_ns,
                         dh_last, dhs):
    """Hand-written GRU BPTT: elementwise gate math + one [B, 3H] @ [3H, H]
    GEMM per reverse step; weight gradients as sequence-sized GEMMs."""
    B, T, E = x.shape
    H = w_hh.shape[0]
    h_prev = jnp.concatenate([jnp.zeros((1, B, H), hs.dtype), hs[:-1]], 0)
    live = (jnp.arange(T)[:, None] < lengths[None, :])[..., None]
    w_hh_T = w_hh.T

    def rstep(dh, inp):
        dhs_t, h_tm1, acts_t, gh_n, live_t = inp
        dh = dh + dhs_t
        r = acts_t[:, 0 * H : 1 * H]
        z = acts_t[:, 1 * H : 2 * H]
        n = acts_t[:, 2 * H : 3 * H]
        dn = dh * (1.0 - z)
        dz = dh * (h_tm1 - n)
        dn_pre = dn * (1.0 - n * n)
        dr = dn_pre * gh_n
        dgh_n = dn_pre * r
        dr_pre = dr * r * (1.0 - r)
        dz_pre = dz * z * (1.0 - z)
        dgi = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=1)
        dgh = jnp.concatenate([dr_pre, dz_pre, dgh_n], axis=1)
        dgi = jnp.where(live_t, dgi, 0.0)
        dgh = jnp.where(live_t, dgh, 0.0)
        dh_prev = jnp.where(
            live_t,
            dh * z + jnp.dot(dgh, w_hh_T, preferred_element_type=jnp.float32),
            dh,
        )
        return dh_prev, (dgi, dgh)

    dh0, (dGI, dGH) = jax.lax.scan(
        rstep, dh_last, (dhs, h_prev, acts, gh_ns, live), reverse=True,
    )
    dw_ih = jnp.einsum("bte,tbg->eg", x, dGI,
                       preferred_element_type=jnp.float32)
    db_ih = dGI.sum(axis=(0, 1))
    dw_hh = jnp.einsum("tbh,tbg->hg", h_prev, dGH,
                       preferred_element_type=jnp.float32)
    db_hh = dGH.sum(axis=(0, 1))
    dx = jnp.einsum("tbg,eg->bte", dGI, w_ih,
                    preferred_element_type=jnp.float32)
    return dx, dw_ih, dw_hh, db_ih, db_hh


@jax.custom_vjp
def _gru_layer_fused(x, lengths, w_ih, w_hh, b_ih, b_hh):
    h_last, hs, _, _ = _gru_layer_fused_fwd(x, lengths, w_ih, w_hh, b_ih,
                                            b_hh)
    return h_last, jnp.swapaxes(hs, 0, 1)


def _gru_fused_fwd_rule(x, lengths, w_ih, w_hh, b_ih, b_hh):
    h_last, hs, acts, gh_ns = _gru_layer_fused_fwd(x, lengths, w_ih, w_hh,
                                                   b_ih, b_hh)
    res = (x, lengths, w_ih, w_hh, hs, acts, gh_ns)
    return (h_last, jnp.swapaxes(hs, 0, 1)), res


def _gru_fused_bwd_rule(res, cot):
    x, lengths, w_ih, w_hh, hs, acts, gh_ns = res
    dh_last, dhs_bt = cot
    dx, dw_ih, dw_hh, db_ih, db_hh = _gru_layer_fused_bwd(
        x, lengths, w_ih, w_hh, hs, acts, gh_ns, dh_last,
        jnp.swapaxes(dhs_bt, 0, 1),
    )
    return dx, None, dw_ih, dw_hh, db_ih, db_hh


_gru_layer_fused.defvjp(_gru_fused_fwd_rule, _gru_fused_bwd_rule)


def gru_forward_fused(
    params: Dict[str, Dict[str, jnp.ndarray]],
    x: jnp.ndarray,                 # [B, T, E]
    lengths: jnp.ndarray,           # [B] int32 (>=1)
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trainable fused twin of :func:`gru_forward` — same restructure as
    lstm_forward_fused (hoisted input GEMM; custom VJP with sequence-sized
    weight-gradient GEMMs).  Gradient-parity-tested vs scan autodiff and
    torch autograd (tests/test_gru_fused.py)."""
    hs = x
    h_last = None
    for layer in range(len(params)):
        p = params[f"layer{layer}"]
        h_last, hs = _gru_layer_fused(hs, lengths, p["w_ih"], p["w_hh"],
                                      p["b_ih"], p["b_hh"])
    return h_last, hs


def gru_forward(
    params: Dict[str, Dict[str, jnp.ndarray]],
    x: jnp.ndarray,                 # [B, T, E]
    lengths: jnp.ndarray,           # [B] int32 (>=1)
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GRU twin of :func:`lstm_forward` (same padding-freeze semantics)."""
    B, T, _ = x.shape
    hs = x
    h_last = None
    for layer in range(len(params)):
        p = params[f"layer{layer}"]
        H = p["w_hh"].shape[0]
        h0 = jnp.zeros((B, H), jnp.float32)

        def step(h, inp):
            x_t, t = inp
            h_new = _gru_step(x_t, h, p["w_ih"], p["w_hh"], p["b_ih"],
                              p["b_hh"], compute_dtype)
            h = jnp.where((t < lengths)[:, None], h_new, h)
            return h, h

        xs = (jnp.swapaxes(hs, 0, 1), jnp.arange(T))
        h_fin, h_seq = jax.lax.scan(step, h0, xs)
        hs = jnp.swapaxes(h_seq, 0, 1)
        h_last = h_fin
    return h_last, hs


def _lstm_layer_fused_fwd(x, lengths, w_ih, w_hh, b):
    """Fused-layout forward for one layer: the input-side GEMM is hoisted
    out of the recurrence as ONE [B*T, E] @ [E, 4H] MXU matmul; the scan
    carries only the [B, H] @ [H, 4H] hidden GEMM per step.

    Returns (h_last, hs) plus the residuals the hand-written VJP needs:
    post-activation gates [T, B, 4H] and cell states [T, B, H].
    """
    B, T, E = x.shape
    H = w_hh.shape[0]
    # hoisted input projection: gx[t] = x_t @ W_ih + b  (time-major)
    gx = (
        jnp.einsum("bte,eg->tbg", x, w_ih, preferred_element_type=jnp.float32)
        + b[None, None, :]
    )                                                     # [T, B, 4H]
    h0 = jnp.zeros((B, H), jnp.float32)
    c0 = jnp.zeros((B, H), jnp.float32)

    def step(carry, inp):
        h, c = carry
        gx_t, t = inp
        gates = gx_t + jnp.dot(h, w_hh, preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, 0 * H : 1 * H])
        f = jax.nn.sigmoid(gates[:, 1 * H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H : 4 * H])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        live = (t < lengths)[:, None]
        h = jnp.where(live, h_new, h)
        c = jnp.where(live, c_new, c)
        acts = jnp.concatenate([i, f, g, o], axis=1)      # post-activation
        return (h, c), (h, c, acts)

    (h_fin, _), (hs, cs, acts) = jax.lax.scan(
        step, (h0, c0), (gx, jnp.arange(T))
    )
    return h_fin, hs, cs, acts


def _lstm_layer_fused_bwd(x, lengths, w_ih, w_hh, hs, cs, acts,
                          dh_last, dhs):
    """Hand-written BPTT for one fused layer.

    The reverse scan does only the elementwise gate math and the
    [B, 4H] @ [4H, H] hidden-grad GEMM per step; every weight gradient is
    ONE sequence-sized GEMM afterwards (dW_ih = X^T dG, dW_hh = H_prev^T dG,
    dX = dG W_ih^T) instead of T accumulating small GEMMs — the MXU-shape
    restructure that motivates the custom VJP (VERDICT r1 item 3).
    """
    B, T, E = x.shape
    H = w_hh.shape[0]
    # h_{t-1}, c_{t-1} sequences (frozen-carry semantics make these the
    # exact pre-step carries)
    h_prev = jnp.concatenate([jnp.zeros((1, B, H), hs.dtype), hs[:-1]], 0)
    c_prev = jnp.concatenate([jnp.zeros((1, B, H), cs.dtype), cs[:-1]], 0)
    live = (jnp.arange(T)[:, None] < lengths[None, :])[..., None]  # [T, B, 1]

    w_hh_T = w_hh.T

    def rstep(carry, inp):
        dh, dc = carry
        dhs_t, c_t, c_tm1, acts_t, live_t = inp
        dh = dh + dhs_t
        i = acts_t[:, 0 * H : 1 * H]
        f = acts_t[:, 1 * H : 2 * H]
        g = acts_t[:, 2 * H : 3 * H]
        o = acts_t[:, 3 * H : 4 * H]
        tanh_c = jnp.tanh(c_t)
        dc_tot = dc + dh * o * (1.0 - tanh_c * tanh_c)
        dg_pre = jnp.concatenate([
            dc_tot * g * i * (1.0 - i),              # d(i pre-act)
            dc_tot * c_tm1 * f * (1.0 - f),          # d(f pre-act)
            dc_tot * i * (1.0 - g * g),              # d(g pre-act)
            dh * tanh_c * o * (1.0 - o),             # d(o pre-act)
        ], axis=1)
        dg_pre = jnp.where(live_t, dg_pre, 0.0)
        dh_prev = jnp.where(
            live_t,
            jnp.dot(dg_pre, w_hh_T, preferred_element_type=jnp.float32),
            dh,
        )
        dc_prev = jnp.where(live_t, dc_tot * f, dc)
        return (dh_prev, dc_prev), dg_pre

    (dh0, _), dG = jax.lax.scan(
        rstep, (dh_last, jnp.zeros_like(dh_last)),
        (dhs, cs, c_prev, acts, live), reverse=True,
    )                                                     # dG [T, B, 4H]
    # sequence-sized weight-gradient GEMMs (the payoff)
    dw_ih = jnp.einsum("bte,tbg->eg", x, dG,
                       preferred_element_type=jnp.float32)
    dw_hh = jnp.einsum("tbh,tbg->hg", h_prev, dG,
                       preferred_element_type=jnp.float32)
    db = dG.sum(axis=(0, 1))
    dx = jnp.einsum("tbg,eg->bte", dG, w_ih,
                    preferred_element_type=jnp.float32)
    return dx, dw_ih, dw_hh, db


@jax.custom_vjp
def _lstm_layer_fused(x, lengths, w_ih, w_hh, b):
    h_last, hs, _, _ = _lstm_layer_fused_fwd(x, lengths, w_ih, w_hh, b)
    return h_last, jnp.swapaxes(hs, 0, 1)


def _fused_fwd_rule(x, lengths, w_ih, w_hh, b):
    h_last, hs, cs, acts = _lstm_layer_fused_fwd(x, lengths, w_ih, w_hh, b)
    res = (x, lengths, w_ih, w_hh, hs, cs, acts)
    return (h_last, jnp.swapaxes(hs, 0, 1)), res


def _fused_bwd_rule(res, cot):
    x, lengths, w_ih, w_hh, hs, cs, acts = res
    dh_last, dhs_bt = cot
    dhs = jnp.swapaxes(dhs_bt, 0, 1)                      # [T, B, H]
    dx, dw_ih, dw_hh, db = _lstm_layer_fused_bwd(
        x, lengths, w_ih, w_hh, hs, cs, acts, dh_last, dhs
    )
    return dx, None, dw_ih, dw_hh, db


_lstm_layer_fused.defvjp(_fused_fwd_rule, _fused_bwd_rule)


def lstm_forward_fused(
    params: Dict[str, Dict[str, jnp.ndarray]],
    x: jnp.ndarray,                 # [B, T, E]
    lengths: jnp.ndarray,           # [B] int32 (>=1)
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trainable fused twin of :func:`lstm_forward` (same semantics).

    Differences are purely structural, for the MXU: the input projection is
    one hoisted sequence-sized GEMM instead of T in-scan GEMMs, and the
    custom VJP turns every weight gradient into one sequence-sized GEMM
    (see _lstm_layer_fused_bwd).  Forward values match lstm_forward
    bit-for-bit up to f32 reassociation; gradients are parity-tested
    against scan autodiff AND the torch oracle (tests/test_lstm_fused.py).

    ``compute_dtype`` is accepted for signature compatibility; this path
    always computes in f32 (training precision).
    """
    hs = x
    h_last = None
    for layer in range(len(params)):
        p = params[f"layer{layer}"]
        h_last, hs = _lstm_layer_fused(hs, lengths, p["w_ih"], p["w_hh"],
                                       p["b"])
    return h_last, hs


def lstm_forward(
    params: Dict[str, Dict[str, jnp.ndarray]],
    x: jnp.ndarray,                 # [B, T, E]
    lengths: jnp.ndarray,           # [B] int32 (>=1)
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (h_last [B, H] at each sequence's true final step, hs [B, T, H]).

    Padded steps (t >= length) freeze the carry, so ``h_last`` equals the
    hidden state after the last real token — identical to running the
    unpadded sequence.
    """
    B, T, _ = x.shape
    num_layers = len(params)
    hs = x
    h_last = None
    for layer in range(num_layers):
        p = params[f"layer{layer}"]
        H = p["w_hh"].shape[0]
        h0 = jnp.zeros((B, H), jnp.float32)
        c0 = jnp.zeros((B, H), jnp.float32)

        def step(carry, inp):
            h, c = carry
            x_t, t = inp
            h_new, c_new = _cell_step(x_t, h, c, p["w_ih"], p["w_hh"], p["b"],
                                      compute_dtype)
            live = (t < lengths)[:, None]
            h = jnp.where(live, h_new, h)
            c = jnp.where(live, c_new, c)
            return (h, c), h

        xs = (jnp.swapaxes(hs, 0, 1), jnp.arange(T))
        (h_fin, _), h_seq = jax.lax.scan(step, (h0, c0), xs)
        hs = jnp.swapaxes(h_seq, 0, 1)
        h_last = h_fin
    return h_last, hs


def masked_mean_pool(hs: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Length-masked mean over hidden states: [B, T, H] -> [B, H].

    hs at t >= length holds the FROZEN carry (the trunks keep h at each
    sequence's last live value), so the mask is required for correctness,
    not hygiene.  Single definition shared by the model's pooling dispatch
    (models/mcn.py) and the Pallas kernels' scan fallback — the fused
    in-kernel accumulator (ops/pallas/*_kernel.py pool="mean") is
    parity-tested against this."""
    T = hs.shape[1]
    mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(hs.dtype)
    return jnp.sum(hs * mask[:, :, None], axis=1) / jnp.maximum(
        lengths[:, None].astype(hs.dtype), 1.0)
