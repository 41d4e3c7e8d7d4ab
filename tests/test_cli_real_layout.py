"""Real-data-day rehearsal (VERDICT r3 next #7): drive the FULL CLI path —
train -> eval -> index -> serve — from an ON-DISK real-layout directory
(annotation JSON + features .npz + glove.txt), exactly the files a user
would drop in for real DiDeMo.  The loaders are unit-tested on this layout
(tests/test_loaders.py); this test proves the composed product surface
needs zero code changes when real data arrives."""

import json
import os

import numpy as np

from vfr_tpu.data.synthetic import (
    charades_lines,
    make_charades_fixture,
    make_didemo_fixture,
)


def _write_didemo_dir(tmp_path):
    d = tmp_path / "didemo_real"
    os.makedirs(d, exist_ok=True)
    # REAL dims (ResNet-152 pool5 2048-d features, 300-d GloVe): the
    # rehearsal must exercise the presets exactly as a real-data user
    # would, with no dim overrides
    fix = make_didemo_fixture(num_videos=12, num_queries=48,
                              feature_dim=2048, glove_dim=300, seed=5)
    n_val = len(fix.annotations) // 5
    (d / "train_data.json").write_text(json.dumps(fix.annotations[:-n_val]))
    (d / "val_data.json").write_text(json.dumps(fix.annotations[-n_val:]))
    np.savez(d / "features_rgb.npz",
             **{v: fix.rgb[v] for v in fix.rgb.ids()})
    np.savez(d / "features_flow.npz",
             **{v: fix.flow[v] for v in fix.flow.ids()})
    # glove.txt in the real glove.6B format: one word per line
    words = [w for w in fix.vocab.itos if w not in ("<pad>", "<unk>")]
    rng = np.random.default_rng(0)
    lines = [
        " ".join([w] + [f"{x:.4f}" for x in rng.standard_normal(300)])
        for w in words
    ]
    (d / "glove.txt").write_text("\n".join(lines))
    return str(d), fix


def test_cli_full_path_from_real_layout_didemo(tmp_path, capsys):
    from vfr_tpu.cli import main

    d, fix = _write_didemo_dir(tmp_path)
    ck = str(tmp_path / "ck")
    common = ["--data-dir", d, "--checkpoint-dir", ck]

    rc = main(["train", "--preset", "didemo_fusion", *common,
               "--batch-size", "12", "--epochs", "2"])
    assert rc == 0
    assert "R@1" in capsys.readouterr().out

    rc = main(["eval", "--preset", "didemo_fusion", *common,
               "--protocol", "didemo_official"])
    assert rc == 0
    assert "R@1" in capsys.readouterr().out

    idx = str(tmp_path / "idx.npz")
    rc = main(["index", "--preset", "didemo_fusion", *common,
               "--out", idx])
    assert rc == 0
    capsys.readouterr()
    assert os.path.exists(idx)

    # serve real-vocabulary queries against the saved index
    qfile = tmp_path / "q.txt"
    words = [w for w in fix.vocab.itos if w not in ("<pad>", "<unk>")][:3]
    qfile.write_text(" ".join(words) + "\n")
    rc = main(["serve", "--preset", "didemo_fusion", *common,
               "--index-path", idx, "--queries", str(qfile), "--topk", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    results = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    assert len(results) == 1
    hits = results[0]["results"]
    assert len(hits) == 3
    dists = [h["distance"] for h in hits]
    assert dists == sorted(dists)
    # the served video ids come from the on-disk corpus
    assert all(h["video"] in fix.rgb.ids() for h in hits)


def test_cli_flagship_surface_from_real_layout(tmp_path, capsys,
                                               monkeypatch):
    """The FLAGSHIP product surface composed from an on-disk real layout
    (VERDICT r4 weak #5 / next #4) — the exact path a real-data user runs
    on day one: `--preset didemo_flagship` train with --best-metric
    (InfoNCE + cosine + mean pooling + mining + EMA), eval/index/serve
    with --best (EMA-tree reload via the checkpoint's own config), a
    cosine-fingerprinted index validated at serve time, and one live
    `!add`/`!save`/boot-from-arena cycle."""
    import io

    from vfr_tpu.cli import main

    d, fix = _write_didemo_dir(tmp_path)
    ck = str(tmp_path / "ck")
    common = ["--data-dir", d, "--checkpoint-dir", ck]

    # batch sized to the 12-video rehearsal fixture; every other flagship
    # knob (loss, distance, pooling, mining cadence, EMA) is the preset's
    rc = main(["train", "--preset", "didemo_flagship", *common,
               "--batch-size", "12", "--epochs", "4",
               "--best-metric", "R@1_tiou0.5"])
    assert rc == 0
    assert "R@1" in capsys.readouterr().out
    assert os.path.exists(os.path.join(ck, "best.msgpack"))
    # the run actually mined (start epoch 3 < 4 epochs)
    tags = [json.loads(l)["tag"]
            for l in open(os.path.join(ck, "metrics.jsonl"))]
    assert "mine" in tags and "best" in tags

    rc = main(["eval", "--preset", "didemo_flagship", *common, "--best",
               "--protocol", "didemo_official"])
    assert rc == 0
    assert "R@1_official" in capsys.readouterr().out

    # cosine-fingerprinted index built FROM the best (EMA) weights...
    idx = str(tmp_path / "idx.npz")
    rc = main(["index", "--preset", "didemo_flagship", *common, "--best",
               "--out", idx])
    assert rc == 0
    capsys.readouterr()
    assert os.path.exists(idx)

    # ...and validated against them at serve time (fingerprint check runs
    # inside serve; a mismatched checkpoint would raise)
    qfile = tmp_path / "q.txt"
    words = [w for w in fix.vocab.itos if w not in ("<pad>", "<unk>")][:3]
    qfile.write_text(" ".join(words) + "\n")
    rc = main(["serve", "--preset", "didemo_flagship", *common, "--best",
               "--index-path", idx, "--queries", str(qfile), "--topk", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    results = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    assert len(results) == 1 and len(results[0]["results"]) == 3
    dists = [h["distance"] for h in results[0]["results"]]
    assert dists == sorted(dists)

    # length-bucketed serving composes with the flagship surface (--best
    # weights, loaded cosine index) and stays BIT-identical (DESIGN 43)
    rc = main(["serve", "--preset", "didemo_flagship", *common, "--best",
               "--index-path", idx, "--queries", str(qfile), "--topk", "3",
               "--length-buckets", "auto"])
    assert rc == 0
    out_b = capsys.readouterr().out
    results_b = [json.loads(l) for l in out_b.splitlines()
                 if l.startswith("{")]
    assert results_b == results

    # live lifecycle on the flagship model: answer, grow, snapshot...
    rng = np.random.default_rng(7)
    delta = tmp_path / "delta.npz"
    np.savez(delta,
             video_ids=np.asarray(["fresh0000", "fresh0001"]),
             rgb=rng.standard_normal((2, 6, 2048)).astype(np.float32),
             flow=rng.standard_normal((2, 6, 2048)).astype(np.float32))
    arena = str(tmp_path / "arena.npz")
    q = " ".join(words)
    monkeypatch.setattr("sys.stdin",
                        io.StringIO(f"{q}\n!add {delta}\n!save {arena}\n"))
    rc = main(["serve", "--preset", "didemo_flagship", *common, "--best",
               "--queries", "-", "--follow", "--topk", "3",
               "--live-capacity-videos", "20"])
    assert rc == 0
    recs = [json.loads(l) for l in
            capsys.readouterr().out.splitlines() if l.strip()]
    assert len(recs) == 3
    assert len(recs[0]["results"]) == 3
    assert recs[1]["added_rows"] == 2 * 21
    assert os.path.exists(arena)

    # ...and boot a fresh daemon from the snapshot: the arena fingerprint
    # must accept the same --best weights and serve the grown corpus
    monkeypatch.setattr("sys.stdin", io.StringIO(f"{q}\n"))
    rc = main(["serve", "--preset", "didemo_flagship", *common, "--best",
               "--queries", "-", "--follow", "--topk", "3",
               "--live-arena", arena])
    assert rc == 0
    recs = [json.loads(l) for l in
            capsys.readouterr().out.splitlines() if l.strip()]
    assert len(recs) == 1 and len(recs[0]["results"]) == 3


def test_cli_full_path_from_real_layout_charades(tmp_path, capsys):
    from vfr_tpu.cli import main

    fix = make_charades_fixture(num_videos=8, num_queries=32,
                                feature_dim=2048, glove_dim=300, seed=3)
    d = tmp_path / "charades_real"
    os.makedirs(d, exist_ok=True)
    lines = charades_lines(fix.annotations)
    (d / "charades_sta_train.txt").write_text("\n".join(lines[:24]))
    (d / "charades_sta_test.txt").write_text("\n".join(lines[24:]))
    np.savez(d / "features_rgb.npz",
             **{v: fix.rgb[v] for v in fix.rgb.ids()})

    ck = str(tmp_path / "ck")
    common = ["--data-dir", str(d), "--checkpoint-dir", ck]
    rc = main(["train", "--preset", "charades_sta", *common,
               "--batch-size", "8", "--epochs", "2"])
    assert rc == 0
    assert "R@1" in capsys.readouterr().out

    rc = main(["corpus", "--preset", "charades_sta", *common,
               "--topk", "5"])
    assert rc == 0
    assert "corpus_video_R@1" in capsys.readouterr().out
