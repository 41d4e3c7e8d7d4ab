"""Pallas GRU: weights VMEM-resident across ALL timesteps (BASELINE.json:5).

Structural twin of ops/pallas/lstm_kernel.py — grid = (T,), constant weight
index maps so the gate matrices are DMA'd into VMEM once and reused every
step, recurrent h in VMEM scratch.  GRU specifics vs the LSTM kernel: torch
(r, z, n) gate order, and the two bias vectors stay SEPARATE because the
n-gate needs ``r * (W_hn h + b_hn)`` — the hidden-side gate pre-activation
must be kept apart from the input-side one (ops/lstm.py init_gru_params).
Padded steps (t >= length) freeze the carry, matching ops.lstm.gru_forward
exactly (parity-tested in tests/test_pallas.py incl. the torch oracle chain
via tests/test_gru.py's scan twin).

Used on inference paths (eval / serving / bench); training differentiates
through the lax.scan twin.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _step(x_ref, len_ref, wih_ref, whh_ref, bih_ref, bhh_ref, h_scr, t):
    """One GRU step (torch (r, z, n) gate order, separate biases so the
    n-gate keeps ``r * (W_hn h + b_hn)`` apart); frozen-carry update of the
    VMEM scratch state.  Returns ``live`` for the pooled accumulator.
    Shared by the hs-emitting and the fused-pool kernel bodies."""
    H = h_scr.shape[1]
    x_t = x_ref[0]                                         # [B, E] (time-major)
    w_dt = wih_ref.dtype                                   # weights as stored
    gi = (
        jax.lax.dot_general(
            x_t.astype(w_dt), wih_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bih_ref[0, :][None, :]
    )                                                      # [B, 3H]
    gh = (
        jax.lax.dot_general(
            h_scr[:].astype(w_dt), whh_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bhh_ref[0, :][None, :]
    )                                                      # [B, 3H]
    r = jax.nn.sigmoid(gi[:, 0 * H : 1 * H] + gh[:, 0 * H : 1 * H])
    z = jax.nn.sigmoid(gi[:, 1 * H : 2 * H] + gh[:, 1 * H : 2 * H])
    n = jnp.tanh(gi[:, 2 * H : 3 * H] + r * gh[:, 2 * H : 3 * H])
    h_new = (1.0 - z) * n + z * h_scr[:]

    live = t < len_ref[:]                                  # [B, 1]
    h_scr[:] = jnp.where(live, h_new, h_scr[:])
    return live


def _kernel(x_ref, len_ref, wih_ref, whh_ref, bih_ref, bhh_ref, hlast_ref,
            hs_ref, h_scr, *, compute_dtype):
    t = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    _step(x_ref, len_ref, wih_ref, whh_ref, bih_ref, bhh_ref, h_scr, t)
    hs_ref[0] = h_scr[:]

    @pl.when(t == T - 1)
    def _():
        hlast_ref[:] = h_scr[:]


def _kernel_pooled(x_ref, len_ref, wih_ref, whh_ref, bih_ref, bhh_ref,
                   hlast_ref, pooled_ref, h_scr, sum_scr, *, compute_dtype):
    """Fused length-masked mean pooling (see lstm_kernel._kernel_pooled):
    live-step sum in VMEM scratch, pooled [B, H] emitted directly — the
    [B, T, H] hidden-state tensor never touches HBM."""
    t = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        sum_scr[:] = jnp.zeros_like(sum_scr)

    live = _step(x_ref, len_ref, wih_ref, whh_ref, bih_ref, bhh_ref, h_scr, t)
    sum_scr[:] = sum_scr[:] + jnp.where(live, h_scr[:], 0.0)

    @pl.when(t == T - 1)
    def _():
        hlast_ref[:] = h_scr[:]
        pooled_ref[:] = sum_scr[:] / jnp.maximum(
            len_ref[:].astype(jnp.float32), 1.0)


def pallas_gru_fits_vmem(
    B: int, E: int, H: int, weights_bytes: int = 2, budget: int = 15 << 20
) -> bool:
    """Conservative VMEM estimate for one kernel invocation.

    Same accounting as pallas_lstm_fits_vmem with 3H gates instead of 4H
    and a single h scratch (no cell state) — the GRU actually has MORE
    headroom than the LSTM at equal (B, E, H)."""
    weights = (E + H) * 3 * H * weights_bytes
    x_blocks = 2 * B * E * 4
    hs_blocks = 2 * B * H * 4
    scratch = B * H * 4
    out = B * H * 4
    bias = 2 * 3 * H * 4
    return weights + x_blocks + hs_blocks + scratch + out + bias <= budget


def _pallas_gru_layer(
    x: jnp.ndarray,        # [B, T, E]
    lengths: jnp.ndarray,  # [B] int32
    w_ih: jnp.ndarray,     # [E, 3H]
    w_hh: jnp.ndarray,     # [H, 3H]
    b_ih: jnp.ndarray,     # [3H]
    b_hh: jnp.ndarray,     # [3H]
    compute_dtype,
    interpret: bool,
    weights_dtype=jnp.bfloat16,
    pool: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (h_last [B, H], hs [B, T, H]) — or, with ``pool=True``, the
    fused-pool kernel's (h_last [B, H], pooled [B, H])."""
    B, T, E = x.shape
    H = w_hh.shape[0]
    # Weights cast once, VMEM-resident in that dtype (bf16 default to fit
    # H=1024); gate GEMMs accumulate in f32 (preferred_element_type).
    w_ih = w_ih.astype(weights_dtype)
    w_hh = w_hh.astype(weights_dtype)
    x_tm = jnp.swapaxes(x, 0, 1)                 # [T, B, E] time-major
    if pool:
        body = functools.partial(_kernel_pooled, compute_dtype=compute_dtype)
        second_spec = pl.BlockSpec((B, H), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM)
        second_shape = jax.ShapeDtypeStruct((B, H), jnp.float32)
        scratch = [pltpu.VMEM((B, H), jnp.float32) for _ in range(2)]
        hs_bytes = 0                         # pooled output is T-independent
    else:
        body = functools.partial(_kernel, compute_dtype=compute_dtype)
        second_spec = pl.BlockSpec((1, B, H), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM)
        second_shape = jax.ShapeDtypeStruct((T, B, H), jnp.float32)
        scratch = [pltpu.VMEM((B, H), jnp.float32)]
        hs_bytes = B * T * H
    h_last, second = pl.pallas_call(
        body,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, E), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            # constant index maps: weights stay VMEM-resident across steps
            pl.BlockSpec((E, 3 * H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            second_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            second_shape,
        ),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * 3 * H * (E + H),
            bytes_accessed=4 * (B * T * E + (E + H) * 3 * H + hs_bytes),
            transcendentals=3 * T * B * H,
        ),
        interpret=interpret,
    )(x_tm, lengths.astype(jnp.int32).reshape(B, 1), w_ih, w_hh,
      b_ih.reshape(1, -1), b_hh.reshape(1, -1))
    if pool:
        return h_last, second
    return h_last, jnp.swapaxes(second, 0, 1)


def pallas_gru(
    params: Dict[str, Dict[str, jnp.ndarray]],
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    compute_dtype=jnp.float32,
    interpret: bool = None,
    weights_dtype=jnp.bfloat16,
    pool: str = "none",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in twin of ops.lstm.gru_forward (multi-layer chains kernels).

    ``weights_dtype`` controls the VMEM-resident weight precision (bf16
    default; pass float32 for bit-parity testing at small H).

    ``pool="mean"`` runs the fused-pool kernel on the LAST layer (see
    pallas_lstm): second return value is the length-masked mean [B, H];
    the [B, T, H] tensor never materializes in HBM.

    Batches too large for the VMEM budget run in batch chunks (identical
    results — the kernel is batch-independent); the lax.scan twin is the
    fallback only when the weights themselves cannot fit."""
    from vfr_tpu.ops.pallas.lstm_kernel import _run_batch_chunks, batch_chunk

    if interpret is None:
        # Mosaic compiles on TPU only; elsewhere run the interpreter so
        # rnn_kernel="pallas" stays usable on the CPU test harness
        interpret = jax.default_backend() != "tpu"
    B = x.shape[0]
    wb = jnp.dtype(weights_dtype).itemsize

    def fits(b):
        return all(
            pallas_gru_fits_vmem(
                b, params[f"layer{l}"]["w_ih"].shape[0],
                params[f"layer{l}"]["w_ih"].shape[1] // 3, wb,
            )
            for l in range(len(params))
        )

    chunk = batch_chunk(B, fits)
    if chunk is None:
        from vfr_tpu.ops.lstm import gru_forward, masked_mean_pool

        h_last, hs = gru_forward(params, x, lengths, compute_dtype)
        if pool == "mean":
            return h_last, masked_mean_pool(hs, lengths)
        return h_last, hs

    def run(xc, lc):
        hs = xc
        h_last = None
        for layer in range(len(params)):
            p = params[f"layer{layer}"]
            h_last, hs = _pallas_gru_layer(
                hs, lc, p["w_ih"], p["w_hh"], p["b_ih"], p["b_hh"],
                compute_dtype, interpret, weights_dtype=weights_dtype,
                pool=(pool == "mean" and layer == len(params) - 1),
            )
        return h_last, hs

    return _run_batch_chunks(run, x, lengths, chunk)
