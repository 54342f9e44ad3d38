"""Label codec, greedy decode, and CER/WER metrics."""

import jax.numpy as jnp
import numpy as np

from htr_vt_tpu.ops.decode import collapse_ids, greedy_decode
from htr_vt_tpu.text.converter import CTCLabelConverter, VIETNAMESE_CHARSET
from htr_vt_tpu.text.metrics import (RecognitionMetrics, batch_edit_distance,
                                     cer_wer, format_string_for_wer)


def test_converter_roundtrip():
    conv = CTCLabelConverter(list("abc d"))
    flat, lengths = conv.encode(["abc", "dd a"])
    assert lengths.tolist() == [3, 4]
    decoded = conv.decode(flat, lengths)
    # decode collapses repeats: "dd" -> "d" (CTC semantics on raw label runs)
    assert decoded[0] == "abc"


def test_converter_padded():
    conv = CTCLabelConverter(list("abc"))
    ids, lengths = conv.encode_padded(["ab", "ccc"], max_len=5)
    assert ids.shape == (2, 5)
    assert ids[0].tolist() == [1, 2, 0, 0, 0]
    assert lengths.tolist() == [2, 3]


def test_converter_iam_bracket_quirk():
    # 87-char alphabet triggers the '['/']' -> 88/89 extension
    # (reference model_v1/utils/utils.py:61-62).
    chars = [chr(0x100 + i) for i in range(87)]
    conv = CTCLabelConverter(chars)
    assert conv.dict["["] == 88 and conv.dict["]"] == 89


def test_vietnamese_charset_size():
    conv = CTCLabelConverter(list(VIETNAMESE_CHARSET))
    assert conv.num_classes == len(VIETNAMESE_CHARSET) + 1  # + blank


def test_greedy_collapse_device_matches_converter():
    conv = CTCLabelConverter(list("abcd"))
    ids = np.array([[1, 1, 0, 2, 2, 2, 0, 0, 3, 3],
                    [0, 0, 4, 0, 4, 4, 1, 0, 0, 0]], np.int32)
    collapsed, lengths = collapse_ids(jnp.asarray(ids))
    ref = conv.decode_batch(ids)
    got = ["".join(conv.character[c] for c in row[:l])
           for row, l in zip(np.asarray(collapsed), np.asarray(lengths))]
    assert got == ref == ["abc", "dda"]


def test_greedy_decode_from_logits():
    logits = np.full((1, 4, 3), -5.0, np.float32)
    for t, c in enumerate([1, 1, 0, 2]):
        logits[0, t, c] = 5.0
    collapsed, lengths = greedy_decode(jnp.asarray(logits))
    assert np.asarray(lengths)[0] == 2
    assert np.asarray(collapsed)[0, :2].tolist() == [1, 2]


def test_edit_distance_native_vs_python():
    from htr_vt_tpu.text import metrics as M
    pairs = [("kitten", "sitting"), ("", "abc"), ("same", "same"),
             ("flaw", "lawn"), ("über", "uber")]
    preds = [[ord(c) for c in a] for a, _ in pairs]
    refs = [[ord(c) for c in b] for _, b in pairs]
    got = batch_edit_distance(preds, refs)
    want = [M._python_levenshtein(p, r) for p, r in zip(preds, refs)]
    assert got.tolist() == want == [3, 3, 0, 2, 1]


def test_format_string_for_wer():
    assert format_string_for_wer("Hello, world!") == "Hello , world !"
    assert format_string_for_wer("a-b") == "a - b"
    assert format_string_for_wer("  a   b  ") == "a b"


def test_cer_wer_aggregation():
    # CER = total edit distance / total ref chars (reference valid.py:74)
    preds = ["abc", "xyz"]
    refs = ["abc", "abc"]
    cer, wer = cer_wer(preds, refs)
    assert abs(cer - 3 / 6) < 1e-9
    assert abs(wer - 1 / 2) < 1e-9


def test_metrics_streaming_equals_batch():
    preds = ["the cat", "sat on", "teh mat!"]
    refs = ["the cat", "sat in", "the mat!"]
    m = RecognitionMetrics()
    for p, r in zip(preds, refs):
        m.update([p], [r])
    cer, wer = cer_wer(preds, refs)
    assert abs(m.cer - cer) < 1e-12
    assert abs(m.wer - wer) < 1e-12
