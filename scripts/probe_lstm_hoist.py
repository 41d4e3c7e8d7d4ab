"""Probe: hoist the input projection out of the Pallas LSTM recurrence?

Current serving kernel (ops/pallas/lstm_kernel.py) computes per step
[B, E+H] @ [E+H, 4H]; the fused TRAINING path already hoists the x-side
to one sequence-sized GEMM (DESIGN 7d).  This measures the inference
twin: xg = x @ w_ih as one big XLA matmul (bf16, f32 accum), kernel per
step only h @ w_hh (+ xg_t from VMEM).  Also halves the VMEM weight
residency (w_ih no longer resident), which lets Q=256 fit unchunked.

Compares encode time + h_last parity vs the production pallas_lstm at
serving shapes (Q=128, T=24, E=300, H=1024).
"""
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vfr_tpu.ops.lstm import init_lstm_params, lstm_forward
from vfr_tpu.ops.pallas.lstm_kernel import pallas_lstm
from vfr_tpu.utils.timing import device_seconds_per_iter

B, T, E, H = 128, 24, 300, 1024
rng = np.random.default_rng(0)
params = init_lstm_params(jax.random.PRNGKey(0), E, H, 1)
x = jnp.asarray(rng.standard_normal((B, T, E)), jnp.float32)
lengths = jnp.asarray(rng.integers(4, T + 1, B), jnp.int32)
p = params["layer0"]


def _kernel_hoisted(xg_ref, len_ref, whh_ref, hlast_ref, h_scr, c_scr):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    gates = (
        xg_ref[0].astype(jnp.float32)
        + jax.lax.dot_general(
            h_scr[:].astype(jnp.bfloat16), whh_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )
    i = jax.nn.sigmoid(gates[:, 0 * H: 1 * H])
    f = jax.nn.sigmoid(gates[:, 1 * H: 2 * H])
    g = jnp.tanh(gates[:, 2 * H: 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H: 4 * H])
    c_new = f * c_scr[:] + i * g
    h_new = o * jnp.tanh(c_new)
    live = t < len_ref[:]
    h_scr[:] = jnp.where(live, h_new, h_scr[:])
    c_scr[:] = jnp.where(live, c_new, c_scr[:])

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        hlast_ref[:] = h_scr[:]


def hoisted_lstm(x, lengths):
    # ONE sequence-sized input GEMM (bf16 in, f32 accum), bias folded in;
    # the per-step xg block streams to VMEM as bf16
    w_ih = p["w_ih"].astype(jnp.bfloat16)
    w_hh = p["w_hh"].astype(jnp.bfloat16)
    xg = (
        jnp.dot(x.reshape(B * T, E).astype(jnp.bfloat16), w_ih,
                preferred_element_type=jnp.float32)
        + p["b"][None, :]
    ).reshape(B, T, 4 * H).astype(jnp.bfloat16)
    xg_tm = jnp.swapaxes(xg, 0, 1)                    # [T, B, 4H]
    h_last = pl.pallas_call(
        _kernel_hoisted,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, 4 * H), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, H), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * 4 * H * H,
            bytes_accessed=2 * B * T * 4 * H + 2 * H * 4 * H + 4 * B * H,
            transcendentals=5 * T * B * H,
        ),
    )(xg_tm, lengths.astype(jnp.int32).reshape(B, 1), w_hh)
    return h_last


def enc_current(i, xx):
    xp = xx + i * 1e-6
    h, _ = pallas_lstm(params, xp, lengths)
    return h


def enc_hoisted(i, xx):
    xp = xx + i * 1e-6
    return hoisted_lstm(xp, lengths)


h_ref, _ = lstm_forward(params, x, lengths)           # f32 scan oracle
h_cur = np.asarray(jax.jit(lambda x: pallas_lstm(params, x, lengths)[0])(x))
h_hoi = np.asarray(jax.jit(lambda x: hoisted_lstm(x, lengths))(x))
h_ref = np.asarray(h_ref)

sec_cur = device_seconds_per_iter(enc_current, x)
sec_hoi = device_seconds_per_iter(enc_hoisted, x)

print(json.dumps({
    "encode_current_ms": round(1e3 * sec_cur, 4),
    "encode_hoisted_ms": round(1e3 * sec_hoi, 4),
    "speedup": round(sec_cur / sec_hoi, 3),
    "maxerr_current_vs_f32scan": float(np.abs(h_cur - h_ref).max()),
    "maxerr_hoisted_vs_f32scan": float(np.abs(h_hoi - h_ref).max()),
    "maxdiff_hoisted_vs_current": float(np.abs(h_hoi - h_cur).max()),
}, indent=1))
