"""bf16 recurrent-state probe (round 5).

The serving LSTM kernel keeps h/c scratch in f32 and casts h to bf16 for
the recurrent gate GEMM every step (weights are bf16 VMEM-resident,
DESIGN 7c).  Hypothesis: keeping the h scratch IN bf16 removes the
per-step cast and halves the MXU's h-operand width; c stays f32 (it is
the accumulator — bf16 c would compound rounding across steps).

Probe-local kernel variant (not shipped): if the win is real the
`state_dtype` knob gets built properly; if neutral/slower this file +
the DESIGN entry are the acquittal.  Numerics note: bf16 h feeds back
into the recurrence, so outputs are NOT bit-equal to the shipped kernel
— the probe also reports the max relative deviation of the pooled
output vs the f32-state kernel to show it stays inside the serving
precision band (bf16 weights already put serving ~1e-2 from the f32
scan twin).

Writes artifacts/state_dtype.json.
"""

import functools
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from vfr_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vfr_tpu.config import get_preset
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import init_model_params
from vfr_tpu.ops.pallas.lstm_kernel import pallas_lstm
from vfr_tpu.utils.timing import device_seconds_per_iter

FEAT, VOCAB = 2048, 4000


def _kernel_pooled_bf16h(x_ref, len_ref, wih_ref, whh_ref, b_ref, hlast_ref,
                         pooled_ref, h_scr, c_scr, sum_scr):
    """_kernel_pooled twin with the h scratch in bf16 (c/sum stay f32)."""
    t = pl.program_id(0)
    T = pl.num_programs(0)
    H = h_scr.shape[1]

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)
        sum_scr[:] = jnp.zeros_like(sum_scr)

    x_t = x_ref[0]
    w_dt = wih_ref.dtype
    gates = (
        jax.lax.dot_general(
            x_t.astype(w_dt), wih_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + jax.lax.dot_general(
            h_scr[:], whh_ref[:],            # h already bf16: no cast
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b_ref[0, :][None, :]
    )
    i = jax.nn.sigmoid(gates[:, 0 * H: 1 * H])
    f = jax.nn.sigmoid(gates[:, 1 * H: 2 * H])
    g = jnp.tanh(gates[:, 2 * H: 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H: 4 * H])
    c_new = f * c_scr[:] + i * g
    h_new = o * jnp.tanh(c_new)

    live = t < len_ref[:]
    h_scr[:] = jnp.where(live, h_new, h_scr[:].astype(jnp.float32)).astype(
        h_scr.dtype)
    c_scr[:] = jnp.where(live, c_new, c_scr[:])
    sum_scr[:] = sum_scr[:] + jnp.where(live, h_new, 0.0)

    @pl.when(t == T - 1)
    def _():
        hlast_ref[:] = h_scr[:].astype(jnp.float32)
        pooled_ref[:] = sum_scr[:] / jnp.maximum(
            len_ref[:].astype(jnp.float32), 1.0)


def pooled_bf16h(params, x, lengths):
    p = params["layer0"]
    w_ih = p["w_ih"].astype(jnp.bfloat16)
    w_hh = p["w_hh"].astype(jnp.bfloat16)
    b = p["b"].reshape(1, -1)
    B, T, E = x.shape
    H = w_hh.shape[0]
    x_tm = jnp.swapaxes(x, 0, 1)
    return pl.pallas_call(
        _kernel_pooled_bf16h,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, E), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 4 * H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.bfloat16),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
    )(x_tm, lengths.astype(jnp.int32).reshape(B, 1), w_ih, w_hh, b)


def main():
    Q = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = get_preset("didemo_flagship")
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    glove = rng.standard_normal((VOCAB, cfg.data.glove_dim)).astype(np.float32)
    params = init_model_params(jax.random.PRNGKey(0), model, glove, FEAT)
    T = int(cfg.data.max_query_len)
    tokens = jnp.asarray(rng.integers(1, VOCAB, size=(Q, T)), jnp.int32)
    lengths = jnp.asarray(rng.integers(4, T + 1, size=(Q,)), jnp.int32)
    lstm = params["lstm"]

    def body_f32(i, tok):
        x = jnp.take(params["embeddings"],
                     1 + (tok + i.astype(jnp.int32)) % (VOCAB - 1), axis=0)
        _, pooled = pallas_lstm(lstm, x, lengths, pool="mean")
        return jnp.sum(jnp.abs(pooled))

    def body_bf16(i, tok):
        x = jnp.take(params["embeddings"],
                     1 + (tok + i.astype(jnp.int32)) % (VOCAB - 1), axis=0)
        _, pooled = pooled_bf16h(lstm, x, lengths)
        return jnp.sum(jnp.abs(pooled))

    out = {"Q": Q, "T": T, "backend": jax.default_backend()}
    for name, body in [("f32_state", body_f32), ("bf16_h_state", body_bf16)]:
        sec = device_seconds_per_iter(body, tokens)
        out[f"{name}_ms"] = round(1e3 * sec, 4)
        print(f"{name}: {1e3 * sec:.4f} ms", flush=True)
    out["speedup"] = round(out["f32_state_ms"] / out["bf16_h_state_ms"], 4)

    # numerics: pooled deviation vs the shipped f32-state kernel
    x = jnp.take(params["embeddings"], tokens, axis=0)
    _, p_ref = pallas_lstm(lstm, x, lengths, pool="mean")
    _, p_bf = pooled_bf16h(lstm, x, lengths)
    dev = float(jnp.max(jnp.abs(p_bf - p_ref) /
                        (jnp.abs(p_ref) + 1e-6)))
    out["max_rel_dev_vs_f32_state"] = round(dev, 5)
    print(f"max rel deviation: {dev:.5f}", flush=True)
    path = pathlib.Path(__file__).resolve().parents[1] / "artifacts" / \
        "state_dtype.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
