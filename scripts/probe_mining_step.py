"""Probe: train-step cost of mined hard negatives (VERDICT r2 #2).

Measures the full fwd+bwd+adam step (elision-proof, utils/timing.py) in
three variants, for BOTH proposal families:

  off   — no mined negatives (the DESIGN 14b baseline)
  old   — mining on, r2 path: embed ALL P proposals of each mined video,
          then gather one row (inlined here for the before/after number)
  new   — mining on, shipped path: gather the mined proposal's pooling-
          matrix/TEF row and embed [B*Hn, 1, .] directly (train/step.py)

At count 8 the old path embeds 8x the batch's own moment-encode work just
to keep one row per mined video; on Charades (P=64 windows) its pool-mix/
epilogue runs 64x the rows it keeps.  Run: python scripts/probe_mining_step.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vfr_tpu.config import get_preset
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import (
    embed_moments,
    embed_queries_multi,
    init_model_params,
)
from vfr_tpu.train.loss import ranking_loss
from vfr_tpu.train.optim import make_optimizer
from vfr_tpu.train.step import loss_from_batch
from vfr_tpu.utils.timing import device_seconds_per_iter

B, HN, F, VOCAB, V = 64, 8, 2048, 1024, 256


def loss_old_path(params, model, tcfg, batch, banks):
    """The r2 hard-negative path: embed all P proposals, gather one."""
    feats = {s: jnp.take(banks[s], batch["video_idx"], axis=0)
             for s in model.streams}
    q = embed_queries_multi(params, model, batch["tokens"], batch["lengths"])
    m = embed_moments(params, model, feats, tef=batch.get("tef"))
    hv, hp = batch["hard_neg_video"], batch["hard_neg_prop"]
    Bq, Hn = hv.shape
    hv_safe = jnp.maximum(hv, 0).reshape(-1)
    hp_safe = jnp.maximum(hp, 0).reshape(-1).astype(jnp.int32)
    feats_h = {s: jnp.take(banks[s], hv_safe, axis=0) for s in model.streams}
    tef_h = (jnp.take(banks["video_tef"], hv_safe, axis=0)
             if "video_tef" in banks else None)
    m_h = embed_moments(params, model, feats_h, tef=tef_h)      # [B*Hn, P, d]
    hard_m = {
        s: jnp.take_along_axis(
            m_h[s], hp_safe[:, None, None], axis=1)[:, 0].reshape(Bq, Hn, -1)
        for s in model.streams
    }
    return ranking_loss(model, tcfg, q, m, target=batch["target"],
                        video_idx=batch["video_idx"],
                        proposal_mask=batch.get("window_mask"),
                        hard_moments=hard_m, hard_valid=hv >= 0)


def probe(preset):
    cfg = get_preset(preset)
    is_charades = preset == "charades_sta"
    if is_charades:
        import dataclasses

        from vfr_tpu.data.charades import CharadesSTADataset
        from vfr_tpu.data.synthetic import make_charades_fixture

        dcfg = dataclasses.replace(cfg.data, feature_dim=F)
        fix = make_charades_fixture(num_videos=V, num_queries=V,
                                    feature_dim=F, glove_dim=cfg.data.glove_dim)
        ds = CharadesSTADataset(fix.annotations, fix.rgb, None, fix.vocab, dcfg)
        model = build_model(cfg, dataset=ds)
        P = ds.num_proposals
        banks = {"rgb": jnp.asarray(ds.rgb_feats),
                 "video_tef": jnp.asarray(ds.video_tef)}
        glove = fix.glove
        rng = np.random.default_rng(0)
        extra = {
            "window_mask": jnp.asarray(ds.window_mask[np.arange(B) % V]),
            "tef": jnp.asarray(ds.video_tef[np.arange(B) % V]),
        }
        vocab_n = glove.shape[0]
    else:
        model = build_model(cfg)
        P = 21
        rng = np.random.default_rng(0)
        glove = rng.standard_normal((VOCAB, cfg.data.glove_dim)).astype(np.float32)
        banks = {
            s: jnp.asarray(rng.standard_normal((V, 6, F)), jnp.float32)
            for s in model.streams
        }
        extra = {}
        vocab_n = VOCAB
    params = init_model_params(jax.random.PRNGKey(0), model, glove, F)
    tcfg = cfg.train
    import dataclasses

    tcfg = dataclasses.replace(tcfg, hard_negative_count=HN)
    opt = make_optimizer(tcfg)
    opt_state = opt.init(params)
    T = int(cfg.data.max_query_len)
    batch0 = {
        "tokens": jnp.asarray(rng.integers(1, vocab_n, size=(B, T)), jnp.int32),
        "lengths": jnp.asarray(rng.integers(4, T + 1, size=(B,)), jnp.int32),
        "target": jnp.asarray(rng.integers(0, P, size=(B,)), jnp.int32),
        "video_idx": jnp.asarray((np.arange(B) % V).astype(np.int32)),
        **extra,
    }
    mined = {
        "hard_neg_video": jnp.asarray(
            rng.integers(0, V, size=(B, HN)), jnp.int32),
        "hard_neg_prop": jnp.asarray(
            rng.integers(0, P, size=(B, HN)), jnp.int32),
    }

    def make_body(loss_fn, with_mining):
        base = dict(batch0)
        if with_mining:
            base.update(mined)

        def body(i, tokens):
            b = dict(base)
            b["tokens"] = 1 + (tokens + i.astype(jnp.int32)) % (vocab_n - 1)
            (loss, aux), grads = jax.value_and_grad(
                lambda p: loss_fn(p, b), has_aux=True)(params)
            updates, _ = opt.update(grads, opt_state, params)
            return jnp.stack(
                [jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(updates)]) + loss
        return body

    new_fn = lambda p, b: loss_from_batch(p, model, tcfg, b,
                                          feature_banks=banks)
    old_fn = lambda p, b: loss_old_path(p, model, tcfg, b, banks)

    out = {}
    for name, fn, mine in (("off", new_fn, False),
                           ("old_all_p", old_fn, True),
                           ("new_one_row", new_fn, True)):
        print(f"[{preset}] timing {name}...", file=sys.stderr, flush=True)
        sec = device_seconds_per_iter(make_body(fn, mine),
                                      batch0["tokens"])
        out[name] = round(1e3 * sec, 4)
    out["P"] = P
    return out


if __name__ == "__main__":
    result = {p: probe(p) for p in sys.argv[1:] or
              ("didemo_fusion", "charades_sta")}
    print(json.dumps(result, indent=1))
