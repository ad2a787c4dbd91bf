"""Native CSV ingest engine: parity with numpy.loadtxt and speed sanity."""

import time

import numpy as np
import pytest

from vgan_tpu.io_native import load_csv, native_available


@pytest.fixture(scope="module")
def csv_files(tmp_path_factory):
    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("csv")
    plain = rng.normal(size=(200, 7))
    p1 = d / "plain.csv"
    np.savetxt(p1, plain, delimiter=",")

    p2 = d / "header.csv"
    with open(p2, "w") as fh:
        fh.write(",".join(f"col{i}" for i in range(7)) + "\n")
        np.savetxt(fh, plain, delimiter=",")

    return {"plain": (p1, plain), "header": (p2, plain)}


def test_native_library_builds():
    assert native_available(), "libvgan_io.so failed to build/load"


@pytest.mark.parametrize("kind", ["plain", "header"])
@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_csv_parity(csv_files, kind, dtype):
    path, expected = csv_files[kind]
    got = load_csv(path, dtype=dtype)
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected.astype(dtype), rtol=1e-6)


def test_csv_no_trailing_newline(tmp_path):
    p = tmp_path / "nnl.csv"
    p.write_text("1.0,2.0\n3.5,4.5")
    got = load_csv(p)
    np.testing.assert_allclose(got, [[1.0, 2.0], [3.5, 4.5]])


def test_csv_scientific_and_negative(tmp_path):
    p = tmp_path / "sci.csv"
    p.write_text("-1.5e-3,2E4\n+0.5,-7\n")
    got = load_csv(p)
    np.testing.assert_allclose(got, [[-1.5e-3, 2e4], [0.5, -7.0]])


def test_csv_malformed_rejected(tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("1.0,2.0\n3.0,oops\n")
    if native_available():
        with pytest.raises(ValueError):
            load_csv(p)


def test_large_csv_speed(tmp_path):
    if not native_available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(1)
    data = rng.normal(size=(20000, 50))
    p = tmp_path / "big.csv"
    np.savetxt(p, data, delimiter=",")

    t0 = time.time()
    got = load_csv(p, dtype=np.float64)
    t_native = time.time() - t0
    np.testing.assert_allclose(got, data, rtol=1e-10)

    t0 = time.time()
    ref = np.loadtxt(p, delimiter=",")
    t_numpy = time.time() - t0
    print(f"native {t_native:.3f}s vs numpy {t_numpy:.3f}s")
    # pathology bound only: wall-clock on shared CI hosts is too noisy for a
    # tight perf assertion (typical uncontended ratio is ~2-10x faster)
    assert t_native < t_numpy * 5.0


def test_no_trailing_newline_page_boundary(tmp_path):
    """File without trailing newline whose size is an exact page multiple:
    the parser must not read past the mapping (guard-byte regression)."""
    import numpy as np
    from vgan_tpu import io_native

    if not io_native.native_available():
        import pytest
        pytest.skip("native lib unavailable")
    page = 4096
    # 511 full 8-byte rows + one 8-byte final line WITHOUT newline
    # = exactly one page, last token flush against the mapping end
    row = "1.5,2.5\n"
    text = row * (page // len(row) - 1) + "9.25,3.5"
    assert not text.endswith("\n")
    assert len(text) % page == 0
    f = tmp_path / "page.csv"
    f.write_text(text)
    arr = io_native.load_csv(f, dtype=np.float64)
    # last (truncated) line "1.5,2.5"[:partial] — compute expected via numpy
    import io
    exp = np.loadtxt(io.StringIO(text), delimiter=",")
    np.testing.assert_allclose(arr, np.atleast_2d(exp))


def test_blank_lines_skipped(tmp_path):
    """Interior and trailing blank lines are not data rows, and the parse
    still succeeds natively (no fallback-to-error)."""
    import numpy as np
    from vgan_tpu import io_native

    f = tmp_path / "blanks.csv"
    f.write_text("a,b\n1,2\n\n3,4\n   \n5,6\n\n\n")
    arr = io_native.load_csv(f, dtype=np.float32)
    np.testing.assert_allclose(arr, [[1, 2], [3, 4], [5, 6]])


def test_malformed_falls_back_to_numpy(tmp_path):
    """A row the native parser rejects degrades to the numpy path (which may
    itself raise, but uniformly) rather than a hard native ValueError."""
    import numpy as np
    import pytest
    from vgan_tpu import io_native

    f = tmp_path / "bad.csv"
    f.write_text("1,2\n3,oops\n")
    with pytest.raises(ValueError):
        # numpy.loadtxt raises ValueError on 'oops' — proving we reached
        # the fallback instead of the native rc!=0 error
        io_native.load_csv(f, dtype=np.float64)


def test_blank_lines_multithreaded(tmp_path):
    """Blank lines must not desynchronize chunk row offsets in the
    multithreaded parse path."""
    import numpy as np
    from vgan_tpu import io_native

    if not io_native.native_available():
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    rows = []
    expected = []
    for i in range(4000):
        vals = rng.integers(0, 100, size=3)
        rows.append(",".join(map(str, vals)))
        expected.append(vals)
        if i % 37 == 0:
            rows.append("")  # interior blank line
    f = tmp_path / "big.csv"
    f.write_text("\n".join(rows) + "\n")
    arr = io_native.load_csv(f, dtype=np.float64, nthreads=8)
    np.testing.assert_allclose(arr, np.asarray(expected, dtype=np.float64))


def test_row_range_reads(tmp_path):
    """skip_rows/max_rows select exactly the contiguous data-row range
    (multi-host ingest path), matching the full read's slice — incl. with
    a header, blank lines, and the multithreaded parser."""
    import numpy as np
    from vgan_tpu import io_native

    rng = np.random.default_rng(5)
    data = rng.integers(0, 1000, size=(3000, 4))
    lines = ["c0,c1,c2,c3"]
    for i, row in enumerate(data):
        lines.append(",".join(map(str, row)))
        if i % 53 == 0:
            lines.append("")
    f = tmp_path / "range.csv"
    f.write_text("\n".join(lines) + "\n")

    full = io_native.load_csv(f, dtype=np.float64, nthreads=8)
    np.testing.assert_allclose(full, data.astype(np.float64))
    for skip, count in [(0, 100), (997, 1003), (2500, 10_000), (3000, 5)]:
        part = io_native.load_csv(
            f, dtype=np.float64, nthreads=8, skip_rows=skip, max_rows=count
        )
        np.testing.assert_allclose(part, full[skip : skip + count])


def test_single_column_csv(tmp_path):
    """Single-column files return (n, 1), native and fallback alike, and
    numeric-prefixed header names are still detected as headers."""
    import numpy as np
    from vgan_tpu import io_native
    from vgan_tpu.io_native import _numpy_fallback

    f = tmp_path / "one.csv"
    f.write_text("1st_percentile\n1.5\n2.5\n3.5\n")
    native = io_native.load_csv(f, dtype=np.float64)
    np.testing.assert_allclose(native, [[1.5], [2.5], [3.5]])
    fb = _numpy_fallback(str(f), np.float64)
    np.testing.assert_allclose(fb, [[1.5], [2.5], [3.5]])
    part = io_native.load_csv(f, dtype=np.float64, skip_rows=1)
    np.testing.assert_allclose(part, [[2.5], [3.5]])


def test_trailing_comma_not_silently_shifted(tmp_path):
    """Review finding: strtof skips newlines, so a trailing comma consumed
    the next line's first value and shifted all rows. Must error (numpy
    errors on the empty field too), never return shifted data."""
    p = tmp_path / "trail.csv"
    p.write_text("1,2,3,\n4,5,6,\n")
    with pytest.raises(ValueError):
        load_csv(p)


def test_ragged_extra_fields_rejected(tmp_path):
    """Extra fields beyond the first content line's column count must error,
    not be silently dropped."""
    p = tmp_path / "ragged.csv"
    p.write_text("h1,h2,h3\n1,2,3\n4,5,6,7\n")
    with pytest.raises(ValueError):
        load_csv(p)


def test_leading_blank_then_header(tmp_path):
    """A blank first line followed by a header parses on both the native
    path and the numpy fallback (the fallback previously sniffed only the
    first physical line)."""
    from vgan_tpu.io_native import _numpy_fallback

    p = tmp_path / "blankhdr.csv"
    p.write_text("\ncol_a,col_b\n1,2\n3,4\n")
    expected = np.asarray([[1.0, 2.0], [3.0, 4.0]])
    np.testing.assert_array_equal(load_csv(p), expected)
    np.testing.assert_array_equal(_numpy_fallback(str(p), np.float64), expected)
