"""End-to-end CLI coverage: train -> test -> infer -> serve -> test_with_lm
share one tiny checkpoint trained in-process."""

import json
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow
from PIL import Image

ARGS_COMMON = ["--embed-dim", "64", "--depth", "1", "--num-heads", "2",
               "--compute-dtype", "float32", "--mask-ratio", "0.2",
               "--max-span-length", "2", "--num-workers", "2"]


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli"))
    sys.argv = ["train", "SYNTH", "--exp-name", "e2e", "--out-dir", out,
                "--train-bs", "8", "--val-bs", "8", "--total-iter", "4",
                "--eval-iter", "4", "--print-iter", "2", "--warm-up-iter", "1",
                *ARGS_COMMON]
    from htr_vt_tpu.cli.train import main
    main()
    return os.path.join(out, "e2e")


def test_train_artifacts(run_dir):
    assert os.path.exists(os.path.join(run_dir, "best_CER"))
    assert os.path.exists(os.path.join(run_dir, "run.log"))


def test_cli_test_writes_predictions(run_dir):
    out = os.path.dirname(run_dir)
    sys.argv = ["test", "SYNTH", "--checkpoint", os.path.join(run_dir, "best_CER"),
                "--out-dir", out, "--exp-name", "e2e", "--val-bs", "8",
                *ARGS_COMMON]
    from htr_vt_tpu.cli.test import main
    main()
    preds = json.load(open(os.path.join(run_dir, "predictions.json")))
    assert "CER" in preds and len(preds["samples"]) == 64
    assert {"prediction", "label", "cer", "wer"} <= set(preds["samples"][0])


def test_cli_infer_runs(run_dir, tmp_path, capsys):
    from htr_vt_tpu.data.synthetic import render_line
    img_path = str(tmp_path / "line.png")
    Image.fromarray(render_line("hello", 64, 512)).save(img_path)
    sys.argv = ["infer", "SYNTH", "--checkpoint", os.path.join(run_dir, "best_CER"),
                "--image", img_path, *ARGS_COMMON]
    from htr_vt_tpu.cli.infer import main
    main()
    assert "[raw]" in capsys.readouterr().out


def test_cli_serve_jsonl(run_dir, tmp_path):
    from htr_vt_tpu.data.synthetic import SyntheticLineDataset
    ds = SyntheticLineDataset(3, seed=5)
    for i in range(3):
        Image.fromarray(ds[i][0]).save(str(tmp_path / f"l{i}.png"))
    out_file = str(tmp_path / "out.jsonl")
    sys.argv = ["serve", "SYNTH", "--checkpoint", os.path.join(run_dir, "best_CER"),
                "--images", str(tmp_path / "l*.png"), "--batch-size", "2",
                "--out", out_file, *ARGS_COMMON]
    from htr_vt_tpu.cli.serve import main
    main()
    records = [json.loads(l) for l in open(out_file)]
    assert len(records) == 3
    assert all({"image", "text"} <= set(r) for r in records)


def test_cli_test_quant_int8(run_dir):
    """--quant int8 drives calibration (one float batch -> quant_stats) and
    the static-int8 eval through the test CLI."""
    sys.argv = ["test", "SYNTH", "--checkpoint", os.path.join(run_dir, "best_CER"),
                "--val-bs", "8", "--quant", "int8",
                "--out-dir", os.path.dirname(run_dir), "--exp-name", "e2e",
                *ARGS_COMMON]
    from htr_vt_tpu.cli.test import main
    main()
    res = json.load(open(os.path.join(run_dir, "predictions.json")))
    assert "CER" in res and len(res["samples"]) == 64


def test_cli_serve_width_buckets(run_dir, tmp_path):
    """--width-buckets routes images by natural width to per-bucket compiled
    programs; output stays in input order and wide lines keep their width
    (the positional embedding extends analytically past the training grid)."""
    from htr_vt_tpu.data.synthetic import SyntheticLineDataset
    ds = SyntheticLineDataset(4, seed=7)
    widths = [200, 600, 900, 80]  # -> buckets 512 / 1024 / 1024 / 512
    for i in range(4):
        img = ds[i][0]
        img = np.asarray(Image.fromarray(img).resize((widths[i], 64)))
        Image.fromarray(img).save(str(tmp_path / f"w{i}.png"))
    out_file = str(tmp_path / "bucketed.jsonl")
    sys.argv = ["serve", "SYNTH", "--checkpoint", os.path.join(run_dir, "best_CER"),
                "--images", str(tmp_path / "w*.png"), "--batch-size", "2",
                "--width-buckets", "512,1024", "--quant", "int8",
                "--out", out_file, *ARGS_COMMON]
    from htr_vt_tpu.cli.serve import main
    main()
    records = [json.loads(l) for l in open(out_file)]
    assert [os.path.basename(r["image"]) for r in records] == \
        [f"w{i}.png" for i in range(4)]


def test_width_bucket_assignment():
    from htr_vt_tpu.data.image import assign_width_buckets
    buckets, owner = assign_width_buckets([80, 512, 513, 2000], [1024, 512])
    assert buckets == [512, 1024]
    assert owner == [0, 0, 1, 1]  # over-wide lines land in the widest bucket


def test_cli_test_with_lm(run_dir, tmp_path):
    from htr_vt_tpu.decode.lm_train import train_ngram_arpa
    arpa = str(tmp_path / "lm.arpa")
    train_ngram_arpa(["hello world", "some words here"] * 3, arpa, order=2)
    sys.argv = ["lm", "SYNTH", "--checkpoint", os.path.join(run_dir, "best_CER"),
                "--arpa", arpa, "--val-bs", "8", "--beam-width", "3",
                "--out-dir", os.path.dirname(run_dir), "--exp-name", "e2e",
                *ARGS_COMMON]
    from htr_vt_tpu.cli.test_with_lm import main
    main()
    res = json.load(open(os.path.join(run_dir, "kenlm_correction_results.json")))
    assert "cer" in res and len(res["samples"]) == 64


def test_cli_test_with_lm_fused_beam(run_dir, tmp_path):
    """--lm-in-beam: char LM fused into the vectorized prefix beam (O(T)
    incremental scoring through the id-indexed native scorer)."""
    from htr_vt_tpu.decode.lm_train import train_ngram_arpa
    arpa = str(tmp_path / "char.arpa")
    train_ngram_arpa(["hello world", "some words here"] * 3, arpa,
                     order=3, level="char")
    sys.argv = ["lm", "SYNTH", "--checkpoint", os.path.join(run_dir, "best_CER"),
                "--arpa", arpa, "--val-bs", "8", "--beam-width", "3",
                "--lm-in-beam", "--lm-weight", "0.4",
                "--out-dir", os.path.dirname(run_dir), "--exp-name", "e2e",
                "--results-out", str(tmp_path / "fused.json"),
                *ARGS_COMMON]
    from htr_vt_tpu.cli.test_with_lm import main
    main()
    res = json.load(open(str(tmp_path / "fused.json")))
    assert "cer" in res and len(res["samples"]) == 64
    assert res["decode_img_per_sec"] > 0


def test_cli_export_bundle(run_dir, tmp_path):
    """Export the trained checkpoint as a StableHLO bundle, reload it with
    deploy.ServingBundle (no model code) and check it reproduces cli.serve's
    transcriptions bit-for-bit."""
    bundle_dir = str(tmp_path / "bundle")
    sys.argv = ["export", "SYNTH", "--checkpoint",
                os.path.join(run_dir, "best_CER"), "--out", bundle_dir,
                "--batch-size", "4", "--verify", *ARGS_COMMON]
    from htr_vt_tpu.cli.export import main
    main()

    from htr_vt_tpu.deploy import ServingBundle
    bundle = ServingBundle(bundle_dir)
    assert bundle.meta["quant"] == "float"
    from htr_vt_tpu.data.synthetic import SyntheticLineDataset
    ds = SyntheticLineDataset(4, seed=7)
    imgs = np.stack([ds[i][0] for i in range(4)])[..., None].astype(np.float32)
    texts = bundle.transcribe(imgs)
    assert len(texts) == 4
    charset = set("".join(bundle.charset[1:]))
    assert all(set(t) <= charset for t in texts)


def test_cli_serve_selftest(run_dir, capsys):
    """--selftest: self-generated natural-width lines through the bucket
    router, scored against their own labels (no --images needed)."""
    sys.argv = ["serve", "SYNTH", "--checkpoint",
                os.path.join(run_dir, "best_CER"), "--selftest",
                "--selftest-n", "4", "--batch-size", "4",
                "--width-buckets", "512,1024", *ARGS_COMMON]
    from htr_vt_tpu.cli.serve import main
    main()
    captured = capsys.readouterr()
    assert captured.out.count('"text"') == 4  # JSONL records
    assert "# selftest CER" in captured.err
    assert "bucket" in captured.err
