"""Native (C++) CRAM reader twin tests: record-for-record agreement with
the Python cramlite implementation on files covering gzip + rANS blocks,
reference-based features, multi-ref slices, unmapped reads, and indexed
region queries."""

from __future__ import annotations

import gzip
import shutil

import numpy as np
import pytest

from grid_tpu.io import cramlite as cl
from tests.test_cramlite import REFS, make_records

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")


@pytest.fixture(scope="module")
def native_cram():
    try:
        from grid_tpu.native import cram

        from grid_tpu import native

        native.lib()
        return cram
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native build failed: {e}")


def _dump_python(path):
    with cl.CramReader(path) as rd:
        rows = []
        for r in rd.iter_records(decode_seq=False):
            rows.append([r.ref_id, r.pos, r.flag, r.mapq, r.mate_ref_id, r.ref_len])
    return np.asarray(rows, dtype=np.int64)


@pytest.mark.parametrize("method", [cl.RAW, cl.GZIP, cl.RANS])
def test_dump_matches_python(tmp_path, native_cram, method):
    rng = np.random.default_rng(0)
    recs = make_records(rng, 400, mapped_frac=0.85)
    rng.shuffle(recs)  # multi-ref slices + unmapped interleaved
    path = tmp_path / "t.cram"
    cl.write_cram(path, REFS, recs, slice_records=128, method=method)
    got = native_cram.dump_records(path)
    want = _dump_python(path)
    np.testing.assert_array_equal(got, want)


def test_dump_matches_python_refbased(tmp_path, native_cram):
    rng = np.random.default_rng(1)
    seq = "".join(rng.choice(list("ACGT"), size=50_000))
    fa = tmp_path / "ref.fa"
    fa.write_text(">chr1\n" + "\n".join(seq[i : i + 60] for i in range(0, len(seq), 60)) + "\n")
    recs = []
    for i in range(300):
        pos = int(rng.integers(0, 49_000))
        s = list(seq[pos : pos + 100])
        for _ in range(int(rng.integers(0, 4))):
            j = int(rng.integers(0, 100))
            s[j] = rng.choice([b for b in "ACGT" if b != s[j]])
        recs.append(cl.CramRecord(
            name=f"s{i}", flag=0, ref_id=0, pos=pos, mapq=60, rl=100,
            seq="".join(s), qual=b"I" * 100, mate_ref_id=0, mate_pos=pos, tlen=0,
        ))
    recs.sort(key=lambda r: r.pos)
    path = tmp_path / "rb.cram"
    cl.write_cram(path, [REFS[0]], recs, reference=fa, method=cl.RANS)
    got = native_cram.dump_records(path)
    want = _dump_python(path)
    np.testing.assert_array_equal(got, want)


def test_count_matches_python(tmp_path, native_cram):
    rng = np.random.default_rng(2)
    recs = make_records(rng, 600, n_refs=1)
    path = tmp_path / "c.cram"
    cl.write_cram(path, [REFS[0]], recs, slice_records=100)
    flags = {83, 147}
    for (start, end) in [(0, 50_000), (5_000, 20_000), (40_000, 41_000)]:
        want = cl.count_reads_region(path, None, "chr1", start, end, flags, min_mapq=20)
        got = native_cram.count_reads_region(path, "chr1", start, end, flags, min_mapq=20)
        assert got == want, (start, end)
    # unindexed scan path
    (tmp_path / "c.cram.crai").unlink()
    got = native_cram.count_reads_region(path, "chr1", 5_000, 20_000, flags, min_mapq=20)
    want = cl.count_reads_region(path, None, "chr1", 5_000, 20_000, flags, min_mapq=20)
    assert got == want
    with pytest.raises(ValueError, match="not found"):
        native_cram.count_reads_region(path, "chrX", 0, 10, flags)


def test_binned_depth_matches_python(tmp_path, native_cram):
    rng = np.random.default_rng(3)
    recs = make_records(rng, 500, n_refs=2)
    path = tmp_path / "d.cram"
    cl.write_cram(path, REFS, recs, slice_records=150, method=cl.RANS)
    py_out = tmp_path / "py.bed.gz"
    nat_out = tmp_path / "nat.bed.gz"
    cl.binned_depth(path, py_out, bin_size=1000)
    native_cram.binned_depth(path, nat_out, bin_size=1000)
    with gzip.open(py_out, "rt") as f:
        py_lines = f.read()
    with gzip.open(nat_out, "rt") as f:
        nat_lines = f.read()
    assert py_lines == nat_lines


class TestNativeWriter:
    """C++ CRAM writer round-trips (VERDICT r1 item #7)."""

    def _recs(self, rng, n=400):
        recs = make_records(rng, n, n_refs=2)
        for r in recs:
            if r.flag & 0x4:
                r.mapq = 0  # MQ is not stored for unmapped (both writers)
        return recs

    def test_native_write_python_read_exact(self, tmp_path, native_cram):
        rng = np.random.default_rng(11)
        recs = self._recs(rng)
        path = tmp_path / "w.cram"
        native_cram.write_cram(path, REFS, recs, slice_records=128)
        with cl.CramReader(path) as rd:
            got = list(rd.iter_records())
        assert len(got) == len(recs)
        for a, b in zip(recs, got):
            assert (a.name, a.flag, a.ref_id, a.pos, a.mapq) == \
                   (b.name, b.flag, b.ref_id, b.pos, b.mapq)
            assert a.seq == b.seq
            assert bytes(a.qual or b"") == bytes(b.qual or b"")

    def test_native_write_native_read_twin(self, tmp_path, native_cram):
        """Native-written and python-written files decode to the same
        records through the NATIVE reader."""
        rng = np.random.default_rng(12)
        recs = self._recs(rng)
        p_nat = tmp_path / "n.cram"
        p_py = tmp_path / "p.cram"
        native_cram.write_cram(p_nat, REFS, recs, slice_records=100)
        cl.write_cram(p_py, REFS, recs, slice_records=100)
        assert np.array_equal(native_cram.dump_records(p_nat),
                              native_cram.dump_records(p_py))

    def test_native_crai_region_query(self, tmp_path, native_cram):
        rng = np.random.default_rng(13)
        recs = self._recs(rng)
        path = tmp_path / "q.cram"
        native_cram.write_cram(path, REFS, recs, slice_records=64)
        assert (tmp_path / "q.cram.crai").exists()
        with cl.CramReader(path) as rd:
            window = list(rd.iter_records("chr1", 3000, 9000))
        with cl.CramReader(path) as rd:
            full = [r for r in rd.iter_records()
                    if r.ref_id == 0 and r.pos < 9000
                    and r.pos + max(r.ref_len, 1) > 3000]
        assert {(r.name, r.pos) for r in window} == {(r.name, r.pos) for r in full}


def test_native_cram_corruption_fuzz_never_crashes(tmp_path, native_cram):
    """Bit-flipped / truncated CRAMs must produce clean error codes from
    every native entry point (the C++ reader guards with try/catch -> -99;
    a crash here would take the whole pipeline process down)."""
    import numpy as np

    rng = np.random.default_rng(3)
    recs = [dict(ref_id=0, pos=int(p), flag=99, mapq=30, rl=60,
                 seq="A" * 60, name=f"r{i}")
            for i, p in enumerate(np.sort(rng.integers(0, 50_000, 300)))]
    path = tmp_path / "fz.cram"
    cl.write_cram(path, [("chr1", 100_000)], recs, method=cl.RANS)
    good = path.read_bytes()

    for trial in range(25):
        raw = bytearray(good)
        if trial % 3 == 0:
            raw = raw[: rng.integers(30, len(raw))]
        for _ in range(int(rng.integers(1, 8))):
            raw[int(rng.integers(0, len(raw)))] ^= int(rng.integers(1, 256))
        bad = tmp_path / "bad.cram"
        bad.write_bytes(bytes(raw))
        for fn in (
            lambda: native_cram.dump_records(bad),
            lambda: native_cram.count_reads_region(bad, "chr1", 0, 100_000, {99}, 0),
            lambda: native_cram.binned_depth(bad, tmp_path / "o.bed.gz"),
            lambda: native_cram.ingest(bad, tmp_path / "o.bed.gz", "chr1",
                                       0, 100_000, [99], 0),
            lambda: native_cram.references(bad),
        ):
            try:
                fn()
            except Exception:
                pass  # clean errors are fine; crashes are not
