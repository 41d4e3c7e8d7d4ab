"""Probe: index buffer LAYOUT for the one-matmul score stage.

bench after entry 12 showed f32-stored m_cat (converted to bf16 in-program,
conversion loop-hoisted) running the distance stage at 0.055 ms while the
bf16-STORED m_cat runs 0.176 ms.  Hypothesis: dot(qc, m_cat.T) on the
bf16-stored buffer reads the RHS through a transposed view with
N-major-unfriendly strides, while the f32 path's convert materializes a
fresh optimally-laid-out operand.  If so, storing the TRANSPOSED cat
layout m_catT [S*d, N] contiguously at build time should match the 0.055.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vfr_tpu.utils.timing import device_seconds_per_iter

S, N, d, Q = 2, 210_000, 128, 128
rng = np.random.default_rng(0)
m32 = rng.standard_normal((N, S * d)).astype(np.float32)
msq = rng.standard_normal(N).astype(np.float32)
q32 = rng.standard_normal((Q, S * d)).astype(np.float32)

m_cat16 = jnp.asarray(m32, jnp.bfloat16)                 # [N, S*d] stored
m_catT16 = jnp.asarray(np.ascontiguousarray(m32.T), jnp.bfloat16)  # [S*d, N]
m_cat32 = jnp.asarray(m32)
msq_j = jnp.asarray(msq)
q_j = jnp.asarray(q32)


def perturb_q(i):
    # rolls the query block so the matmul input differs per iteration
    return jnp.roll(q_j, i.astype(jnp.int32) % Q, axis=0) + i * 1e-6


def a_bf16_view(i, x):
    qc = perturb_q(i).astype(jnp.bfloat16)
    return jnp.dot(qc, m_cat16.T, preferred_element_type=jnp.float32) - msq_j


def b_bf16_transposed_stored(i, x):
    qc = perturb_q(i).astype(jnp.bfloat16)
    return jnp.dot(qc, m_catT16, preferred_element_type=jnp.float32) - msq_j


def c_f32_convert(i, x):
    qc = perturb_q(i).astype(jnp.bfloat16)
    return jnp.dot(qc, m_cat32.T.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32) - msq_j


out = {}
for name, fn in [("a_bf16_stored_T_view", a_bf16_view),
                 ("b_bf16_stored_transposed", b_bf16_transposed_stored),
                 ("c_f32_stored_inprog_convert", c_f32_convert)]:
    print(f"timing {name}...", file=sys.stderr, flush=True)
    sec = device_seconds_per_iter(fn, q_j)
    out[name + "_ms"] = round(1e3 * sec, 4)
print(json.dumps(out, indent=1))
