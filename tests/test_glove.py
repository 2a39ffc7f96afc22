"""GloVe table construction from a standard text distribution file
(the spaCy-free path that unblocks the reference's best config,
data_loader.py:18-23 being spaCy-only)."""

import numpy as np

from vqa_attention_networks_tpu.cli import build_glove
from vqa_attention_networks_tpu.data.glove import (
    build_glove_table_from_text,
    load_glove_table,
)


def _fixture_file(tmp_path, dim=4):
    lines = [
        "cat 0.1 0.2 0.3 0.4",
        "dog -1.0 0.5 0.25 0.0",
        # 840B-style token containing a space: must split from the right
        ". . 9.0 9.0 9.0 9.0",
        "malformed 1.0 2.0",  # wrong arity: skipped
        "sky 1 2 3 4",
        "unused 7 7 7 7",
    ]
    path = tmp_path / "glove.test.txt"
    path.write_text("\n".join(lines) + "\n")
    return str(path)


def test_build_from_text_matches_vocab_rows(tmp_path):
    vocab = {"cat": 1, "sky": 2, ". .": 3, "dog": 4, "oov": 5, "UNK": 6}
    table = build_glove_table_from_text(
        vocab, _fixture_file(tmp_path), dim=4
    )
    assert table.shape == (7, 4)
    np.testing.assert_array_equal(table[0], 0.0)  # pad row
    np.testing.assert_allclose(table[1], [0.1, 0.2, 0.3, 0.4])
    np.testing.assert_allclose(table[2], [1, 2, 3, 4])
    np.testing.assert_allclose(table[3], [9, 9, 9, 9])  # space token
    np.testing.assert_allclose(table[4], [-1.0, 0.5, 0.25, 0.0])
    np.testing.assert_array_equal(table[5], 0.0)  # OOV stays zero
    np.testing.assert_array_equal(table[6], 0.0)  # UNK not in vectors


def test_build_glove_cli_vectors_path(tmp_path):
    import json

    vocab_file = tmp_path / "v.vocab.json"
    vocab_file.write_text(json.dumps({
        "question_vocab": {"cat": 1, "dog": 2, "UNK": 3},
        "answer_vocab": {"yes": 0, "UNK": 1},
        "max_question_length": 5,
    }))
    out = tmp_path / "table.npy"
    # GLOVE_DIM is 300; the fixture is 4-dim, so go through the API with an
    # explicit dim for the row check and the CLI end-to-end with a 300-dim row
    vec300 = tmp_path / "glove300.txt"
    vec300.write_text(
        "cat " + " ".join(["0.5"] * 300) + "\n"
        "dog " + " ".join(["1.5"] * 300) + "\n"
    )
    build_glove.main([
        "--vocab", str(vocab_file), "--out", str(out),
        "--vectors", str(vec300),
    ])
    table = load_glove_table(str(out))
    assert table.shape == (4, 300)
    np.testing.assert_allclose(table[1], 0.5)
    np.testing.assert_allclose(table[2], 1.5)
    np.testing.assert_array_equal(table[3], 0.0)


def test_committed_840b_format_fixture(tmp_path):
    """Readiness gate for the real glove.840B.300d.txt (VERDICT round-2 #9):
    a COMMITTED checksum-pinned fixture in the published format — 300-dim,
    LF endings, UTF-8, case-sensitive tokens, digits/punctuation, and
    tokens containing literal spaces — so the loader's first real-file run
    is not its first-ever run. The sha256 pin keeps the fixture from
    silently drifting away from the format it certifies."""
    import hashlib
    import os

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "glove_840b_mini.txt")
    body = open(path, "rb").read()
    assert hashlib.sha256(body).hexdigest() == (
        "f34cc4c61c375916c3ea4fb3b866593ea9db777597f26d5dff45fc9c6075fb1d"
    )

    # vocab hits ordinary words, the case-sensitive twin, unicode,
    # punctuation, digit, both space-containing tokens, and an OOV
    vocab = {"the": 1, "The": 2, "café": 3, "?": 4, "2": 5,
             ". . .": 6, "at name@domain.com": 7, "cat": 8,
             "zzz_not_there": 9, "UNK": 10}
    stats = {}
    table = build_glove_table_from_text(vocab, path, stats=stats)
    assert table.shape == (11, 300)
    assert stats["matched"] == 8
    assert stats["unmatched_words"] == ["UNK", "zzz_not_there"]
    # case-sensitive: 'the' and 'The' carry distinct vectors
    assert not np.allclose(table[1], table[2])
    # every matched row is a real (nonzero) vector; OOV and pad stay zero
    for idx in range(1, 9):
        assert np.abs(table[idx]).sum() > 0, idx
    np.testing.assert_array_equal(table[0], 0.0)
    np.testing.assert_array_equal(table[9], 0.0)
    # spot-pin one value against an independent parse of the raw line
    line = next(l for l in body.decode("utf-8").splitlines()
                if l.startswith("cat "))
    want = np.asarray(line.rsplit(" ", 300)[1:], np.float32)
    np.testing.assert_array_equal(table[8], want)


def test_reproduce_driver_wires_glove_vectors(tmp_path, capsys):
    """tools/reproduce.py --glove_vectors plans the build_glove step with
    the vectors file and trains mhb_coAtt with --glove 1 (dry run)."""
    import os

    import tools.reproduce as rp

    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           "glove_840b_mini.txt")
    rp.main([
        "--data_dir", str(tmp_path), "--models", "mhb_coAtt",
        "--glove_vectors", fixture, "--dry_run",
    ])
    plan = capsys.readouterr().out
    build_lines = [l for l in plan.splitlines()
                   if "build_glove" in l and l.startswith("+ ")]
    assert len(build_lines) == 1
    assert f"--vectors {fixture}" in build_lines[0]
    train_lines = [l for l in plan.splitlines()
                   if ".train --model_name mhb_coAtt" in l]
    assert train_lines and all("--glove 1" in l for l in train_lines)


def test_text_loader_reports_exact_match_stats(tmp_path):
    vocab = {"cat": 1, "dog": 2, "zzz_missing": 3, "UNK": 4}
    path = tmp_path / "vectors.txt"
    path.write_text(
        "cat " + " ".join(["0.0"] * 300) + "\n"  # zero vector still a MATCH
        + "dog " + " ".join(["1.0"] * 300) + "\n"
    )
    stats = {}
    from vqa_attention_networks_tpu.data.glove import (
        build_glove_table_from_text,
    )

    build_glove_table_from_text(vocab, str(path), stats=stats)
    assert stats["matched"] == 2  # cat (zero vector!) + dog
    assert stats["vocab_words"] == 4
    assert stats["unmatched_words"] == ["UNK", "zzz_missing"]
