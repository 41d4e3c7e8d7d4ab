"""Pallas LSTM: weights VMEM-resident across ALL timesteps (BASELINE.json:5).

Grid = (T,).  The weight blocks use constant index maps, so Pallas DMAs them
into VMEM once and reuses them for every step — the guarantee `lax.scan`
cannot make.  The recurrent state (h, c) lives in VMEM scratch, which
persists across sequential TPU grid steps; per step the kernel runs the two
gate GEMMs on the MXU and the gate nonlinearities on the VPU.  Padded steps
(t >= length) freeze the carry, matching ops.lstm.lstm_forward exactly
(parity-tested in tests/test_pallas.py, incl. vs the torch oracle chain).

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


def _kernel(x_ref, len_ref, wih_ref, whh_ref, b_ref, hlast_ref, hs_ref,
            h_scr, c_scr, *, compute_dtype):
    t = pl.program_id(0)
    T = pl.num_programs(0)
    H = h_scr.shape[1]

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    x_t = x_ref[0]                                         # [B, E] (time-major)
    w_dt = wih_ref.dtype                                   # weights as stored
    gates = (
        jax.lax.dot_general(
            x_t.astype(w_dt), wih_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + jax.lax.dot_general(
            h_scr[:].astype(w_dt), whh_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b_ref[0, :][None, :]
    )                                                      # [B, 4H]
    i = jax.nn.sigmoid(gates[:, 0 * H : 1 * H])
    f = jax.nn.sigmoid(gates[:, 1 * H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H : 4 * H])
    c_new = f * c_scr[:] + i * g
    h_new = o * jnp.tanh(c_new)

    live = t < len_ref[:]                                  # [B, 1]
    h_scr[:] = jnp.where(live, h_new, h_scr[:])
    c_scr[:] = jnp.where(live, c_new, c_scr[:])
    hs_ref[0] = h_scr[:]

    @pl.when(t == T - 1)
    def _():
        hlast_ref[:] = h_scr[:]


def pallas_lstm_fits_vmem(
    B: int, E: int, H: int, weights_bytes: int = 2, budget: int = 15 << 20
) -> bool:
    """Conservative VMEM estimate for one kernel invocation.

    Resident: gate weights ((E+H) x 4H in ``weights_dtype``), double-buffered
    x/hs step blocks, h/c scratch, h_last out, bias.  The compiler's scoped
    budget is 16 MB; we keep headroom.  At H=1024, E=300 this admits B<=128
    (B=256 measured OOM at 20.2 MB)."""
    weights = (E + H) * 4 * H * weights_bytes
    x_blocks = 2 * B * E * 4
    hs_blocks = 2 * B * H * 4
    scratch = 2 * B * H * 4
    out = B * H * 4
    bias = 4 * H * 4
    return weights + x_blocks + hs_blocks + scratch + out + bias <= budget


def _pallas_lstm_layer(
    x: jnp.ndarray,        # [B, T, E]
    lengths: jnp.ndarray,  # [B] int32
    w_ih: jnp.ndarray,     # [E, 4H]
    w_hh: jnp.ndarray,     # [H, 4H]
    b: jnp.ndarray,        # [4H]
    compute_dtype,
    interpret: bool,
    weights_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    B, T, E = x.shape
    H = w_hh.shape[0]
    # Weights are cast once on the host side and stay VMEM-resident in that
    # dtype: f32 [H, 4H] alone would blow the ~16 MB VMEM budget at H=1024.
    # Gate GEMMs accumulate in f32 regardless (preferred_element_type).
    w_ih = w_ih.astype(weights_dtype)
    w_hh = w_hh.astype(weights_dtype)
    x_tm = jnp.swapaxes(x, 0, 1)                 # [T, B, E] time-major
    h_last, hs_tm = pl.pallas_call(
        functools.partial(_kernel, compute_dtype=compute_dtype),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, E), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            # constant index maps: weights stay VMEM-resident across steps
            pl.BlockSpec((E, 4 * H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * 4 * H * (E + H),
            bytes_accessed=4 * (B * T * E + (E + H) * 4 * H + B * T * H),
            transcendentals=5 * T * B * H,
        ),
        interpret=interpret,
    )(x_tm, lengths.astype(jnp.int32).reshape(B, 1), w_ih, w_hh,
      b.reshape(1, -1))
    return h_last, jnp.swapaxes(hs_tm, 0, 1)


def pallas_lstm(
    params: Dict[str, Dict[str, jnp.ndarray]],
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    compute_dtype=jnp.float32,
    interpret: bool = None,
    weights_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in twin of ops.lstm.lstm_forward (multi-layer chains kernels).

    ``weights_dtype`` controls the VMEM-resident weight precision (bf16
    default — required to fit H=1024 in VMEM; pass float32 for bit-parity
    testing at small H).

    Batches too large for the VMEM budget are processed in batch CHUNKS
    (the kernel is batch-independent, so results are identical); only if
    even a minimal chunk cannot fit the weights does it fall back to the
    lax.scan twin.  Previously B=256 (the serving preset's query batch)
    silently lost the kernel entirely."""
    if interpret is None:
        # Mosaic compiles on TPU only; elsewhere run the interpreter so
        # rnn_kernel="pallas" stays usable on the CPU test harness
        interpret = jax.default_backend() != "tpu"
    B = x.shape[0]
    wb = jnp.dtype(weights_dtype).itemsize

    def fits(b):
        return all(
            pallas_lstm_fits_vmem(
                b, params[f"layer{l}"]["w_ih"].shape[0],
                params[f"layer{l}"]["w_ih"].shape[1] // 4, wb,
            )
            for l in range(len(params))
        )

    chunk = batch_chunk(B, fits)
    if chunk is None:
        from vfr_tpu.ops.lstm import lstm_forward

        return lstm_forward(params, x, lengths, compute_dtype)

    def run(xc, lc):
        hs = xc
        h_last = None
        for layer in range(len(params)):
            p = params[f"layer{layer}"]
            h_last, hs = _pallas_lstm_layer(
                hs, lc, p["w_ih"], p["w_hh"], p["b"], compute_dtype,
                interpret, weights_dtype=weights_dtype,
            )
        return h_last, hs

    return _run_batch_chunks(run, x, lengths, chunk)


def batch_chunk(B, fits):
    """Largest 8-aligned batch chunk satisfying ``fits`` (None if none)."""
    chunk = B
    while chunk > 8 and not fits(chunk):
        chunk = ((chunk + 1) // 2 + 7) // 8 * 8
    return chunk if fits(chunk) else None


def _run_batch_chunks(run, x, lengths, chunk):
    """Apply ``run`` over 8-aligned batch chunks; one compiled kernel shape
    (the tail chunk is zero-padded and trimmed)."""
    B = x.shape[0]
    if chunk >= B:
        return run(x, lengths)
    pad = (-B) % chunk
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
        lengths = jnp.concatenate(
            [lengths, jnp.zeros((pad,), lengths.dtype)]
        )
    outs = [run(x[i : i + chunk], lengths[i : i + chunk])
            for i in range(0, x.shape[0], chunk)]
    h_last = jnp.concatenate([o[0] for o in outs])[:B]
    hs = jnp.concatenate([o[1] for o in outs])[:B]
    return h_last, hs
