"""find_files (batch, one directory scan) must agree with find_file (the
reference's per-sample glob, grid/utils/utils.py:46-53) on every sample —
including the suffix-boundary cases where naive substring matching and
glob semantics diverge."""

import random
import string

from grid_tpu.ingest.alignments import find_file, find_files


def _touch(d, name):
    (d / name).write_bytes(b"")


def test_find_files_matches_find_file(tmp_path):
    names = [
        "SYN00000.bam", "SYN00001.bam", "SYN00001_extra.bam", "aSYN00002b.bam",
        "SYN00003.cram", "noext", ".hiddenSYN00004.bam", "x.bam",
        "bam.bam", "SYN.bam.bam", "prefix.SYN00005.bam", "SYN00006.bam.bak",
    ]
    for n in names:
        _touch(tmp_path, n)
    samples = [
        "SYN00000", "SYN00001", "SYN00002", "SYN00003", "SYN00004",
        "SYN00005", "SYN00006", "SYN", "bam",  # 'bam' only matches inside stems
        "x", "missing", "",  # empty sample: glob *'*.bam' matches everything
    ]
    for ftype in ("bam", "cram"):
        batch = find_files(tmp_path, samples, ftype)
        for s in samples:
            assert batch[s] == find_file(tmp_path, s, ftype), (s, ftype)
    # no expected_type: both return None
    assert find_files(tmp_path, samples, None) == {s: None for s in samples}
    assert find_file(tmp_path, "SYN00000", None) is None


def test_find_files_randomized_agreement(tmp_path):
    rng = random.Random(7)
    alphabet = string.ascii_uppercase[:6] + "._-"
    names = set()
    while len(names) < 60:
        stem = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
        names.add(stem + rng.choice([".bam", ".cram", ".txt", ""]))
    for n in names:
        if n and not n.startswith("."):
            _touch(tmp_path, n)
    samples = ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 5)))
               for _ in range(40)]
    batch = find_files(tmp_path, samples, "bam")
    for s in set(samples):
        assert batch[s] == find_file(tmp_path, s, "bam"), s


def test_find_files_missing_directory(tmp_path):
    out = find_files(tmp_path / "nope", ["a", "b"], "bam")
    assert out == {"a": None, "b": None}
