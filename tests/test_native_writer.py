"""Native distance-CSV writer (src/tracs_native.cpp::tn_format_dist_rows):
byte-identical to the Python f-string fallback, including CPython float-repr
presentation (fixed/scientific switch, trailing .0, two-digit exponents)."""

import argparse
import ctypes

import numpy as np
import pytest

from tracs_tpu.runtime import native as tn


@pytest.fixture
def rng():
    return np.random.default_rng(99)


def test_repr_double_fuzz(rng):
    lib = tn.get_lib()
    if lib is None:
        pytest.skip("native lib unavailable")
    buf = ctypes.create_string_buffer(64)

    def nrepr(v):
        n = lib.tn_repr_double(ctypes.c_double(v), buf)
        return buf.raw[:n].decode()

    vals = list(rng.random(2000))
    vals += list(rng.random(2000) * 10.0 ** rng.integers(-320, 308, 2000))
    vals += list(-rng.random(500) * 10.0 ** rng.integers(-10, 20, 500))
    vals += [0.0, -0.0, 1.0, -1.0, 0.1, 1e-4, 9.999e-5, 1e16, 1e15, 1e17,
             float("inf"), float("-inf"), float("nan"), 5e-324,
             1.7976931348623157e308, 123456789012345.0, -1e16]
    vals += [float(x) for x in rng.integers(0, 10 ** 15, 500)]
    for v in vals:
        assert nrepr(float(v)) == repr(float(v))


def test_format_rows_matches_python(rng):
    lib = tn.get_lib()
    if lib is None:
        pytest.skip("native lib unavailable")
    n = 5000
    names = [f"s{i:04d}" for i in range(300)] + ["weird name-αβ"]
    rows = rng.integers(0, len(names), n)
    cols = rng.integers(0, len(names), n)
    dvals = rng.integers(0, 10 ** 6, n)
    nn = rng.integers(0, 10 ** 7, n)
    dd = rng.random(n) * 10.0 ** rng.integers(-8, 2, n)
    p0 = rng.random(n) * np.exp(-rng.integers(0, 200, n).astype(float))
    eK = rng.random(n) * 10.0 ** rng.integers(-3, 4, n)
    filt = rng.integers(0, 10 ** 5, n)

    # full columns
    got = tn.native_format_rows(names, rows, cols, dvals, nn, "myref",
                                datediff=dd, p0=p0, eK=eK, filt=filt)
    want = "".join(
        f"{names[rows[k]]},{names[cols[k]]},{dd[k]},{int(dvals[k])},"
        f"{p0[k]},{eK[k]},{filt[k]},{nn[k]},myref\n"
        for k in range(n)
    )
    assert got == want

    # NA columns (no metadata, no filter)
    got = tn.native_format_rows(names, rows, cols, dvals, nn, "r2")
    want = "".join(
        f"{names[rows[k]]},{names[cols[k]]},NA,{int(dvals[k])},NA,NA,NA,"
        f"{nn[k]},r2\n"
        for k in range(n)
    )
    assert got == want

    # empty input
    assert tn.native_format_rows(names, [], [], [], [], "r") is None


def _run_distance(tmp_path, monkeypatch, use_native, streaming, aln, dates_csv):
    from tracs_tpu.stages.distance import distance

    if not use_native:
        monkeypatch.setattr(tn, "get_lib", lambda: None)
    out = tmp_path / ("out_%s_%s.csv" % (use_native, streaming))
    args = argparse.Namespace(
        msa_files=[str(aln)], msa_db=None, metadata=str(dates_csv),
        snp_threshold=2 ** 31 - 1, clock_rate=29.903, trans_rate=73.0,
        precision=0.01, trans_threshold=None, recomb_filter=False,
        output_file=str(out), n_cpu=1, loglevel="WARNING",
        row_block=(2 if streaming else None), resume=False,
    )
    distance(args)
    return out.read_bytes()


def test_stage_native_vs_fallback(tmp_path, monkeypatch, rng):
    if tn.get_lib() is None:
        pytest.skip("native lib unavailable")
    import gzip

    chars = np.array(list("ACGTN"))
    base = rng.choice(np.array(list("ACGT")), size=400)
    recs = []
    for i in range(7):
        s = base.copy()
        idx = rng.choice(400, size=6, replace=False)
        s[idx] = rng.choice(chars, size=6)
        recs.append((f"samp{i}", "".join(s)))
    aln = tmp_path / "aln.fasta.gz"
    with gzip.open(aln, "wt") as fh:
        for nm, s in recs:
            fh.write(f">{nm}\n{s}\n")
    dates_csv = tmp_path / "dates.csv"
    with open(dates_csv, "w") as fh:
        fh.write("sample,date\n")
        for i, (nm, _) in enumerate(recs):
            fh.write(f"{nm},2020-0{1 + i % 9}-1{i % 8}\n")

    a = _run_distance(tmp_path, monkeypatch, True, False, aln, dates_csv)
    b = _run_distance(tmp_path, monkeypatch, False, False, aln, dates_csv)
    assert a == b
    c = _run_distance(tmp_path, monkeypatch, True, True, aln, dates_csv)
    assert a == c


def test_native_dist_csv_reader(tmp_path, rng):
    if tn.get_lib() is None:
        pytest.skip("native lib unavailable")
    p = tmp_path / "d.csv"
    p.write_text(
        "h\n"
        "b,a,0.1,5,0.9,0.5,1,8,ref\n"
        "a,c,0.1,99,0.9,0.5,1,8,ref\n"
        "c,b,0.1,2,0.9,0.5,1,8,ref\n"
    )
    I, J, names, count = tn.native_read_dist_csv(str(p), 3, 10)
    assert names == ["b", "a", "c"]  # first-appearance order
    assert count == 3
    assert list(zip(I, J)) == [(0, 1), (2, 0)]  # rows with snp <= 10

    # float("NA") parity: a literal NA in the metric column raises
    q = tmp_path / "e.csv"
    q.write_text("h\na,b,NA,5,NA,NA,0,8,ref\n")
    with pytest.raises(ValueError):
        tn.native_read_dist_csv(str(q), 2, 10)
