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


def _step(x_ref, len_ref, wih_ref, whh_ref, b_ref, h_scr, c_scr, t):
    """One LSTM step: gate GEMMs on the MXU, nonlinearities on the VPU,
    frozen-carry update of the VMEM scratch state.  Returns ``live`` so
    callers can feed the pooled accumulator.  Shared by the hs-emitting and
    the fused-pool kernel bodies — ONE definition of the cell math."""
    H = h_scr.shape[1]
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
    return live


def _kernel(x_ref, len_ref, wih_ref, whh_ref, b_ref, hlast_ref, hs_ref,
            h_scr, c_scr, *, compute_dtype):
    t = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    _step(x_ref, len_ref, wih_ref, whh_ref, b_ref, h_scr, c_scr, t)
    hs_ref[0] = h_scr[:]

    @pl.when(t == T - 1)
    def _():
        hlast_ref[:] = h_scr[:]


def _kernel_pooled(x_ref, len_ref, wih_ref, whh_ref, b_ref, hlast_ref,
                   pooled_ref, h_scr, c_scr, sum_scr, *, compute_dtype):
    """Fused length-masked mean pooling: instead of streaming every [B, H]
    step block to HBM (and re-reading the [B, T, H] tensor for the masked
    mean downstream), accumulate the live-step sum in a VMEM scratch and
    emit the pooled [B, H] directly — 2*T*B*H*4 bytes of HBM traffic gone.
    Semantics == ops.lstm.masked_mean_pool(scan hs) (parity-tested)."""
    t = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)
        sum_scr[:] = jnp.zeros_like(sum_scr)

    live = _step(x_ref, len_ref, wih_ref, whh_ref, b_ref, h_scr, c_scr, t)
    # h_scr now holds h_t for live rows and the frozen carry otherwise;
    # only live steps contribute to the mean.
    sum_scr[:] = sum_scr[:] + jnp.where(live, h_scr[:], 0.0)

    @pl.when(t == T - 1)
    def _():
        hlast_ref[:] = h_scr[:]
        pooled_ref[:] = sum_scr[:] / jnp.maximum(
            len_ref[:].astype(jnp.float32), 1.0)


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
    pool: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (h_last [B, H], hs [B, T, H]) — or, with ``pool=True``, the
    fused-pool kernel's (h_last [B, H], pooled [B, H])."""
    B, T, E = x.shape
    H = w_hh.shape[0]
    # Weights are cast once on the host side and stay VMEM-resident in that
    # dtype: f32 [H, 4H] alone would blow the ~16 MB VMEM budget at H=1024.
    # Gate GEMMs accumulate in f32 regardless (preferred_element_type).
    w_ih = w_ih.astype(weights_dtype)
    w_hh = w_hh.astype(weights_dtype)
    x_tm = jnp.swapaxes(x, 0, 1)                 # [T, B, E] time-major
    if pool:
        body = functools.partial(_kernel_pooled, compute_dtype=compute_dtype)
        second_spec = pl.BlockSpec((B, H), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM)
        second_shape = jax.ShapeDtypeStruct((B, H), jnp.float32)
        scratch = [pltpu.VMEM((B, H), jnp.float32) for _ in range(3)]
        hs_bytes = 0                         # pooled output is T-independent
    else:
        body = functools.partial(_kernel, compute_dtype=compute_dtype)
        second_spec = pl.BlockSpec((1, B, H), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM)
        second_shape = jax.ShapeDtypeStruct((T, B, H), jnp.float32)
        scratch = [pltpu.VMEM((B, H), jnp.float32) for _ in range(2)]
        hs_bytes = B * T * H
    h_last, second = pl.pallas_call(
        body,
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
            second_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            second_shape,
        ),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * 4 * H * (E + H),
            bytes_accessed=4 * (B * T * E + (E + H) * 4 * H + hs_bytes),
            transcendentals=5 * T * B * H,
        ),
        interpret=interpret,
    )(x_tm, lengths.astype(jnp.int32).reshape(B, 1), w_ih, w_hh,
      b.reshape(1, -1))
    if pool:
        return h_last, second
    return h_last, jnp.swapaxes(second, 0, 1)


def pallas_lstm(
    params: Dict[str, Dict[str, jnp.ndarray]],
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    compute_dtype=jnp.float32,
    interpret: bool = None,
    weights_dtype=jnp.bfloat16,
    pool: str = "none",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in twin of ops.lstm.lstm_forward (multi-layer chains kernels).

    ``weights_dtype`` controls the VMEM-resident weight precision (bf16
    default — required to fit H=1024 in VMEM; pass float32 for bit-parity
    testing at small H).

    ``pool="mean"`` runs the fused-pool kernel on the LAST layer: the
    length-masked mean accumulates in VMEM scratch and the second return
    value is the pooled [B, H] — the [B, T, H] hidden-state tensor is
    never materialized in HBM (the serving win for
    ModelConfig.query_pool="mean"; parity vs masked_mean_pool(scan hs)
    in tests/test_pallas_pooled.py).

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
        from vfr_tpu.ops.lstm import lstm_forward, masked_mean_pool

        h_last, hs = lstm_forward(params, x, lengths, compute_dtype)
        if pool == "mean":
            return h_last, masked_mean_pool(hs, lengths)
        return h_last, hs

    def run(xc, lc):
        hs = xc
        h_last = None
        for layer in range(len(params)):
            p = params[f"layer{layer}"]
            h_last, hs = _pallas_lstm_layer(
                hs, lc, p["w_ih"], p["w_hh"], p["b"], compute_dtype,
                interpret, weights_dtype=weights_dtype,
                pool=(pool == "mean" and layer == len(params) - 1),
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
