"""Adversarial CRAM conformance corpus (VERDICT r2 #3).

The self-contained CRAM claim cannot rest on same-author round-trips alone
(no htslib/samtools in this environment — see scripts/validate_htslib.sh
for the one-command check to run when one appears). This corpus attacks
the readers with structures the product writer never emits:

- every block codec the spec allows (raw, gzip, bzip2, lzma, rANS order-0
  AND order-1) — bzip2/lzma blocks are produced by Python's stdlib
  encoders, an implementation INDEPENDENT of both readers' decoders;
- a forged MULTI-SLICE container (spliced at the byte level from
  single-slice containers; the writer only emits one slice per container);
- a >64k-record slice;
- 100kb reads (long CIGAR reference spans);
- reference-based records with substitution features, with and without
  embedded-reference blocks; detached mates throughout;
- unmapped records interleaved with mapped ones.

Every artifact must decode to the identical record stream through BOTH
readers (pure-Python cramlite and native cram.cpp) and match the known
ground truth. Reference semantics under test: the htslib CRAM 3.0 ingest
the reference pipeline uses via pysam (grid/utils/count_reads.py:95).
"""

from __future__ import annotations

import shutil
from pathlib import Path

import numpy as np
import pytest

from grid_tpu.io import cramlite as cl

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")


@pytest.fixture(scope="module")
def native_cram():
    try:
        from grid_tpu import native
        from grid_tpu.native import cram as nc

        native.lib()
        return nc
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native build failed: {e}")


def _mk_records(n, seed=0, rl=100, ref_id=0, unmapped_every=0):
    rng = np.random.default_rng(seed)
    recs = []
    pos = 10
    for i in range(n):
        pos += int(rng.integers(1, 40))
        flag = int(rng.choice([83, 147, 99, 163]))
        rid = ref_id
        if unmapped_every and i % unmapped_every == 0:
            flag |= 0x4
        seq = "".join(rng.choice(list("ACGT"), size=rl))
        recs.append(dict(ref_id=rid, pos=pos, flag=flag,
                         mapq=int(rng.integers(0, 60)), rl=rl, seq=seq,
                         name=f"q{i:06d}"))
    return recs


def _dump_python(path, reference=None):
    out = []
    with cl.CramReader(path, reference=reference) as rd:
        for r in rd.iter_records(decode_seq=True):
            out.append((r.ref_id, r.pos, r.flag, r.mapq, r.ref_len, r.seq))
    return out


def _assert_twins_and_truth(path, native_cram, recs):
    """Both readers byte-equal AND matching the written ground truth."""
    py = _dump_python(path)
    nat = native_cram.dump_records(path)
    assert len(py) == len(recs) == nat.shape[0]
    for i, (rec, p) in enumerate(zip(recs, py)):
        assert p[0] == rec["ref_id"], i
        assert p[1] == rec["pos"], i
        assert p[2] == rec["flag"], i
        assert p[3] == rec["mapq"], i
        assert p[5] == rec["seq"], i
        # native dump: (ref_id, pos, flag, mapq, mate_ref, ref_len)
        assert nat[i, 0] == rec["ref_id"] and nat[i, 1] == rec["pos"], i
        assert nat[i, 2] == rec["flag"] and nat[i, 3] == rec["mapq"], i


@pytest.mark.parametrize("method,label", [
    (cl.RAW, "raw"), (cl.GZIP, "gzip"), (cl.BZIP2, "bzip2"), (cl.LZMA, "lzma"),
])
def test_block_codecs(tmp_path, native_cram, method, label):
    recs = _mk_records(300, seed=1)
    p = tmp_path / f"c_{label}.cram"
    cl.write_cram(p, [("chr1", 200000)], [dict(r) for r in recs], method=method)
    _assert_twins_and_truth(p, native_cram, recs)


@pytest.mark.parametrize("n,label", [(300, "order0"), (20000, "order1")])
def test_rans_orders(tmp_path, native_cram, n, label):
    """cramlite picks rANS order by block size (>=4096 bytes -> order-1);
    20k records force order-1 on every data series."""
    recs = _mk_records(n, seed=2, rl=20)
    p = tmp_path / f"c_rans_{label}.cram"
    cl.write_cram(p, [("chr1", 2_000_000)], [dict(r) for r in recs], method=cl.RANS)
    _assert_twins_and_truth(p, native_cram, recs)


def test_big_slice_over_64k_records(tmp_path, native_cram):
    """One slice holding >2^16 records (counters must not be 16-bit)."""
    recs = _mk_records(70_000, seed=3, rl=4)
    p = tmp_path / "c_bigslice.cram"
    cl.write_cram(p, [("chr1", 5_000_000)], [dict(r) for r in recs],
                  slice_records=70_000, method=cl.RANS)
    _assert_twins_and_truth(p, native_cram, recs)


def test_long_reads_long_ref_span(tmp_path, native_cram):
    """100 kb reads: ref_len/CIGAR spans far beyond normal short reads."""
    recs = _mk_records(5, seed=4, rl=100_000)
    p = tmp_path / "c_longreads.cram"
    cl.write_cram(p, [("chr1", 10_000_000)], [dict(r) for r in recs],
                  method=cl.GZIP)
    _assert_twins_and_truth(p, native_cram, recs)


def test_unmapped_interleaved(tmp_path, native_cram):
    recs = _mk_records(200, seed=5, unmapped_every=7)
    p = tmp_path / "c_unmapped.cram"
    cl.write_cram(p, [("chr1", 200000)], [dict(r) for r in recs])
    py = _dump_python(p)
    nat = native_cram.dump_records(p)
    assert len(py) == len(recs) == nat.shape[0]
    for i, rec in enumerate(recs):
        assert py[i][2] == rec["flag"] == nat[i, 2]


def _refbased_setup(tmp_path, seed=6, embed=False):
    rng = np.random.default_rng(seed)
    ref_seq = "".join(rng.choice(list("ACGT"), size=50_000))
    fasta = tmp_path / "ref.fa"
    fasta.write_text(">chr1\n" + "\n".join(
        ref_seq[i:i + 60] for i in range(0, len(ref_seq), 60)) + "\n")
    recs = []
    pos = 100
    for i in range(120):
        pos += int(rng.integers(5, 50))
        seq = list(ref_seq[pos:pos + 100])
        for _ in range(int(rng.integers(0, 4))):  # substitution features
            j = int(rng.integers(0, 100))
            seq[j] = "ACGT"[(("ACGT".index(seq[j])) + 1) % 4]
        recs.append(dict(ref_id=0, pos=pos, flag=99, mapq=60, rl=100,
                         seq="".join(seq), name=f"s{i:05d}"))
    p = tmp_path / ("c_embedref.cram" if embed else "c_refbased.cram")
    cl.write_cram(p, [("chr1", len(ref_seq))], [dict(r) for r in recs],
                  reference=str(fasta), embed_reference=embed, method=cl.RANS)
    return p, fasta, recs


def test_refbased_substitution_features(tmp_path, native_cram):
    p, fasta, recs = _refbased_setup(tmp_path)
    py = _dump_python(p, reference=str(fasta))
    assert [x[5] for x in py] == [r["seq"] for r in recs]
    nat = native_cram.dump_records(p)
    assert nat.shape[0] == len(recs)
    assert (nat[:, 1] == np.array([r["pos"] for r in recs])).all()


def test_embedded_reference_decodes_without_fasta(tmp_path, native_cram):
    p, _fasta, recs = _refbased_setup(tmp_path, embed=True)
    py = _dump_python(p, reference=None)  # no FASTA: embedded block only
    assert [x[5] for x in py] == [r["seq"] for r in recs]
    nat = native_cram.dump_records(p)
    assert nat.shape[0] == len(recs)


# ---------------------------------------------------------- multi-slice ---


def _forge_multislice(src: Path, dst: Path):
    """Splice the data containers of a single-slice-per-container CRAM into
    ONE multi-slice container. Slices must share an identical compression
    header (asserted); landmarks are rebuilt. Produces a structure the
    product writer never emits — the reader stress this corpus exists for."""
    blob = src.read_bytes()
    cur = cl.ByteCursor(blob, 0)
    assert blob[:4] == cl.CRAM_MAGIC
    cur.pos = 6 + 20  # magic + version + file id

    containers = []
    while cur.pos < len(blob):
        h = cl.read_container_header(cur)
        body = cur.read(h.length)
        containers.append((h, body))
        if h.ref_id == -1 and h.n_records == 0 and h.n_bases == 0 and not containers[:-1]:
            pass
    # containers[0] = SAM header container; the rest are single-slice data
    hdr_c, data_cs = containers[0], containers[1:]
    eof = None
    if data_cs and data_cs[-1][0].n_records == 0:  # EOF container
        eof = data_cs.pop()
    assert len(data_cs) >= 2, "need >=2 containers to splice"

    comp_blobs, slice_blobs = [], []
    for h, body in data_cs:
        lm = h.landmarks[0]
        comp_blobs.append(body[:lm])
        slice_blobs.append(body[lm:])
    assert all(b == comp_blobs[0] for b in comp_blobs), (
        "comp headers differ; pick record sets with identical codebooks"
    )

    body = bytearray(comp_blobs[0])
    landmarks = []
    for sb in slice_blobs:
        landmarks.append(len(body))
        body += sb
    h0 = data_cs[0][0]
    starts = [h.start for h, _ in data_cs]
    ends = [h.start + h.span for h, _ in data_cs]
    merged = cl.write_container_header(
        h0.ref_id, min(starts), max(ends) - min(starts),
        sum(h.n_records for h, _ in data_cs), h0.record_counter,
        sum(h.n_bases for h, _ in data_cs),
        sum(h.n_blocks for h, _ in data_cs) - (len(data_cs) - 1),
        landmarks, len(body),
    )

    out = bytearray(blob[:26])
    hh, hb = hdr_c
    out += cl.write_container_header(
        hh.ref_id, hh.start, hh.span, hh.n_records, hh.record_counter,
        hh.n_bases, hh.n_blocks, hh.landmarks, len(hb))
    out += hb
    out += merged
    out += body
    if eof is not None:
        eh, eb = eof
        out += cl.write_container_header(
            eh.ref_id, eh.start, eh.span, eh.n_records, eh.record_counter,
            eh.n_bases, eh.n_blocks, eh.landmarks, len(eb))
        out += eb
    dst.write_bytes(bytes(out))


def test_forged_multislice_container(tmp_path, native_cram):
    """3 slices in ONE container: both readers must walk every landmark."""
    recs = _mk_records(300, seed=7, rl=50)
    src = tmp_path / "single.cram"
    # identical per-slice comp headers need uniform name lengths (they are)
    cl.write_cram(src, [("chr1", 200000)], [dict(r) for r in recs],
                  slice_records=100, method=cl.GZIP, build_index=False)
    dst = tmp_path / "multislice.cram"
    _forge_multislice(src, dst)
    _assert_twins_and_truth(dst, native_cram, recs)


def test_vendored_golden_fixture(native_cram):
    """The committed golden.cram (the file scripts/validate_htslib.sh points
    samtools at) must decode to its committed expectation through BOTH
    readers — pins the corpus bytes against reader AND writer drift."""
    root = Path(__file__).parent / "data" / "conformance"
    exp = [ln.split("\t") for ln in
           (root / "golden.expected.tsv").read_text().splitlines()[1:]]
    py = _dump_python(root / "golden.cram")
    nat = native_cram.dump_records(root / "golden.cram")
    assert len(py) == len(exp) == nat.shape[0]
    for p, nrow, e in zip(py, nat, exp):
        assert p[1] == int(e[2]) and p[2] == int(e[3]) and p[3] == int(e[4])
        assert p[5] == e[5]
        assert nrow[1] == int(e[2]) and nrow[2] == int(e[3])
