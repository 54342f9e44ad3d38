"""The real-dataset disk path, end to end: raw IAM-format archives through
``format_datasets`` to ``.ln`` lists, ``FileLineDataset``, the train/test
CLIs and a CER — so no code path from archive to metric is review-only
(reference pipeline: data/format_datasets.py + data/dataset.py:48-135).

The fixtures synthesize byte-faithful miniatures of the real formats:
  * IAM: a ``lines.tgz`` with the nested a01/a01-000u/<id>.png layout plus
    form XMLs carrying the text in each <line> tag (entities included), one
    label with the '¬' crossed-out marker the formatter must strip.
  * READ2016: a page scan + PAGE-XML with polygon line coords.
"""

import json
import os
import sys
import tarfile
import xml.sax.saxutils

import numpy as np
import pytest

pytestmark = pytest.mark.slow
from PIL import Image

from htr_vt_tpu.data.format_datasets import (format_iam, format_read2016,
                                             write_list_file)
from htr_vt_tpu.data.synthetic import render_line

IAM_LINES = {
    "a01-000u-00": 'A MOVE to stop Mr. Gaitskell',
    "a01-000u-01": 'from nominating any more',
    "a01-000u-02": 'Labour life Peers "quoted"',
    "a01-003-00": "crossed out¬ words kept",
    "a01-003-01": "the quick brown fox",
    "a01-003-02": "jumps over the lazy dog",
    "a01-003-03": "pack my box with five",
    "a01-007-00": "dozen liquor jugs now",
    "b02-000-00": "some more handwriting",
    "b02-000-01": "lines to train on",
    "b02-000-02": "written by another hand",
    "b02-011-00": "with a different slant",
    "b02-011-01": "and varying thickness",
    "b02-011-02": "of every stroke drawn",
    "c03-000-00": "final couple of lines",
    "c03-000-01": "closing out the batch",
}


@pytest.fixture(scope="module")
def iam_disk(tmp_path_factory):
    root = tmp_path_factory.mktemp("iam_raw")
    # --- build lines.tgz with IAM's nested form-directory layout ---
    src = root / "lines_src"
    for lid in IAM_LINES:
        form = "-".join(lid.split("-")[:2])       # a01-000u
        writer = lid.split("-")[0]                # a01
        d = src / writer / form
        d.mkdir(parents=True, exist_ok=True)
        img = render_line(IAM_LINES[lid].replace("¬", ""), 64, 512)
        Image.fromarray(img).save(str(d / f"{lid}.png"))
    archive = str(root / "lines.tgz")
    with tarfile.open(archive, "w:gz") as tar:
        tar.add(str(src), arcname="lines")

    # --- form XMLs: one per form, text attr with XML entities ---
    xml_dir = root / "xml"
    xml_dir.mkdir()
    forms = {}
    for lid, text in IAM_LINES.items():
        forms.setdefault("-".join(lid.split("-")[:2]), []).append((lid, text))
    for form, lines in forms.items():
        rows = "\n".join(
            f'    <line id="{lid}" text={xml.sax.saxutils.quoteattr(t)}/>'
            for lid, t in lines)
        (xml_dir / f"{form}.xml").write_text(
            f'<?xml version="1.0"?>\n<form id="{form}">\n  <handwritten-part>\n'
            f'{rows}\n  </handwritten-part>\n</form>\n')

    out_dir = str(root / "lines")
    n = format_iam(archive, str(xml_dir), out_dir)
    assert n == len(IAM_LINES)

    ids = sorted(IAM_LINES)
    write_list_file(str(root / "train.ln"), [i + ".png" for i in ids[:8]])
    write_list_file(str(root / "val.ln"), [i + ".png" for i in ids[8:]])
    write_list_file(str(root / "test.ln"), [i + ".png" for i in ids[8:]])
    return root


def test_formatter_strips_marker_and_decodes_entities(iam_disk):
    txt = (iam_disk / "lines" / "a01-003-00.txt").read_text()
    assert txt == "crossed out words kept"          # '¬' stripped
    txt2 = (iam_disk / "lines" / "a01-000u-02.txt").read_text()
    assert txt2 == 'Labour life Peers "quoted"'     # entities decoded by ET


def test_file_line_dataset_loads_formatted_lines(iam_disk):
    from htr_vt_tpu.data.lists import LineIndex
    from htr_vt_tpu.data.loader import FileLineDataset

    idx = LineIndex.from_list_file(str(iam_disk / "train.ln"),
                                   str(iam_disk / "lines") + "/")
    assert len(idx) == 8
    ds = FileLineDataset(idx)
    img, label = ds[0]
    assert img.shape == (64, 512) and img.dtype == np.uint8
    assert label == IAM_LINES[sorted(IAM_LINES)[0]]


def test_cli_train_and_test_over_disk_dataset(iam_disk, tmp_path):
    """.ln list -> FileLineDataset -> train a few iters -> test CLI -> CER:
    the full reference workflow (run/iam.sh) on a real on-disk dataset."""
    out = str(tmp_path)
    common = ["--embed-dim", "64", "--depth", "1", "--num-heads", "2",
              "--compute-dtype", "float32", "--num-workers", "2",
              "--train-data-list", str(iam_disk / "train.ln"),
              "--val-data-list", str(iam_disk / "val.ln"),
              "--test-data-list", str(iam_disk / "test.ln"),
              "--data-path", str(iam_disk / "lines") + "/"]
    sys.argv = ["train", "IAM", "--exp-name", "disk", "--out-dir", out,
                "--train-bs", "8", "--val-bs", "8", "--total-iter", "3",
                "--eval-iter", "3", "--print-iter", "1", "--warm-up-iter", "1",
                "--mask-ratio", "0.2", "--max-span-length", "2", *common]
    from htr_vt_tpu.cli.train import main as train_main
    train_main()
    run_dir = os.path.join(out, "disk")
    assert os.path.exists(os.path.join(run_dir, "best_CER"))

    sys.argv = ["test", "IAM", "--checkpoint", os.path.join(run_dir, "best_CER"),
                "--out-dir", out, "--exp-name", "disk", "--val-bs", "8", *common]
    from htr_vt_tpu.cli.test import main as test_main
    test_main()
    preds = json.load(open(os.path.join(run_dir, "predictions.json")))
    assert len(preds["samples"]) == 8
    assert np.isfinite(preds["CER"]) and np.isfinite(preds["WER"])
    # untrained tiny model: CER is bad but must be a real edit-distance ratio
    assert 0.0 <= preds["CER"] <= 3.0


def test_read2016_page_xml_formatter(tmp_path):
    pages = tmp_path / "pages"
    xmls = tmp_path / "page_xml"
    pages.mkdir(), xmls.mkdir()

    page = np.full((300, 800), 255, np.uint8)
    texts = ["erste zeile text", "zweite zeile hier"]
    boxes = [(40, 30, 720, 90), (60, 150, 700, 210)]  # x0,y0,x1,y1
    for (x0, y0, x1, y1), t in zip(boxes, texts):
        line = render_line(t, y1 - y0, x1 - x0)
        page[y0:y1, x0:x1] = line
    Image.fromarray(page).save(str(pages / "page_0001.JPG"))

    ns = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15"
    regions = "\n".join(
        f'  <TextLine id="l{i}"><Coords points="{x0},{y0} {x1},{y0} {x1},{y1} {x0},{y1}"/>'
        f'<TextEquiv><Unicode>{t}</Unicode></TextEquiv></TextLine>'
        for i, ((x0, y0, x1, y1), t) in enumerate(zip(boxes, texts)))
    (xmls / "page_0001.xml").write_text(
        f'<?xml version="1.0"?>\n<PcGts xmlns="{ns}"><Page>\n{regions}\n'
        f'</Page></PcGts>\n')

    out = str(tmp_path / "lines")
    n = format_read2016(str(pages), str(xmls), out)
    assert n == 2
    for i, t in enumerate(texts):
        assert (tmp_path / "lines" / f"page_0001_l{i}.txt").read_text() == t
        img = np.array(Image.open(str(tmp_path / "lines" / f"page_0001_l{i}.png")))
        assert img.shape[0] > 30 and img.shape[1] > 300
        assert img.min() < 128  # actually contains ink


def test_flatten_directory(tmp_path):
    (tmp_path / "a" / "b").mkdir(parents=True)
    (tmp_path / "a" / "b" / "x.png").write_bytes(b"p")
    (tmp_path / "a" / "y.txt").write_text("t")
    from htr_vt_tpu.data.format_datasets import flatten_directory
    flatten_directory(str(tmp_path))
    assert (tmp_path / "x.png").exists() and (tmp_path / "y.txt").exists()
    assert not (tmp_path / "a").exists()


def test_prepare_data_preflight_and_smoke(iam_disk, tmp_path, capsys):
    """The real-data arrival runbook (cli/prepare_data) over the same
    byte-faithful miniature the formatter tests use: preflight (id grammar,
    XML schema, join coverage, sha256 record), format, shipped-list
    coverage, and the 10-line smoke train — so the command that will run on
    the real archives is itself e2e-tested (round-4 verdict #7)."""
    out = str(tmp_path / "lines_out")
    report_path = str(tmp_path / "report.json")
    argv = ["prepare_data", "iam",
            "--archive", str(iam_disk / "lines.tgz"),
            "--xml-dir", str(iam_disk / "xml"),
            "--out", out, "--lists", str(iam_disk),
            "--smoke", "--report", report_path]
    old = sys.argv
    try:
        sys.argv = argv
        from htr_vt_tpu.cli.prepare_data import main as prep_main
        prep_main()
    finally:
        sys.argv = old
    report = json.load(open(report_path))
    assert report["n_formatted"] == len(IAM_LINES)
    assert report["n_joined"] == len(IAM_LINES)
    assert set(report["list_coverage"]) == {"train.ln", "val.ln", "test.ln"}
    assert all(v == 1.0 for v in report["list_coverage"].values())
    assert report["smoke"] == "ok"
    out_text = capsys.readouterr().out
    assert "PASS" in out_text and "FAIL" not in out_text


def test_prepare_data_rejects_mismatched_xml(iam_disk, tmp_path):
    """Join-coverage gate: an XML dir from a different release (no matching
    line ids) must fail preflight, not produce an empty dataset."""
    import xml.sax.saxutils
    bad_xml = tmp_path / "xml"
    bad_xml.mkdir()
    (bad_xml / "z99-999.xml").write_text(
        '<?xml version="1.0"?>\n<form id="z99-999">\n'
        '  <line id="z99-999-00" text="unrelated"/>\n</form>\n')
    argv = ["prepare_data", "iam",
            "--archive", str(iam_disk / "lines.tgz"),
            "--xml-dir", str(bad_xml),
            "--out", str(tmp_path / "o"), "--lists", str(iam_disk)]
    old = sys.argv
    try:
        sys.argv = argv
        from htr_vt_tpu.cli.prepare_data import main as prep_main
        with pytest.raises(SystemExit) as ei:
            prep_main()
        assert ei.value.code == 1
    finally:
        sys.argv = old
