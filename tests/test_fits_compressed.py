"""Tile-compressed FITS reads: RICE_1 (native C++ decoder + Python fallback),
GZIP_1, and quantized floats with per-tile ZSCALE/ZZERO.

The compressor lives HERE, in the test, written independently from the
decoder (sunerf_tpu/native/rice.cpp) so the two implementations check each
other. The reference relies on astropy for these reads
(sunerf/data/utils.py:54-71); JSOC exports and SECCHI archives are routinely
Rice-compressed."""
import zlib

import numpy as np
import pytest

from sunerf_tpu.data.fits import BLOCK, CARD, read_fits, write_fits

_RICE_PARAMS = {1: (3, 6), 2: (4, 14), 4: (5, 25)}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def bytes(self):
        if self.n:
            pad = 8 - self.n
            return bytes(self.out) + bytes([(self.acc << pad) & 0xFF])
        return bytes(self.out)


def rice_compress(pixels: np.ndarray, bytepix: int = 2,
                  nblock: int = 32) -> bytes:
    """Independent RICE_1 encoder: seed pixel, then per block a split
    position fs (or the verbatim escape) and folded first differences."""
    fsbits, fsmax = _RICE_PARAMS[bytepix]
    bbits = bytepix * 8
    mask = (1 << bbits) - 1
    half = 1 << (bbits - 1)
    w = _BitWriter()

    vals = [int(v) & mask for v in np.asarray(pixels).ravel()]
    w.put(vals[0], bbits)
    last = vals[0]
    for start in range(0, len(vals), nblock):
        block = vals[start:start + nblock]
        codes = []
        for v in block:
            delta = (v - last) & mask
            if delta >= half:
                delta -= 1 << bbits  # signed wrap
            codes.append(2 * delta if delta >= 0 else -2 * delta - 1)
            last = v
        if max(codes) == 0:
            w.put(0, fsbits)  # zero-entropy block
            continue
        # split so the unary part stays short; fall back to verbatim
        fs = max(0, max(codes).bit_length() - 3)
        if fs >= fsmax or max(c >> fs for c in codes) > 24:
            w.put(fsmax + 1, fsbits)
            for c in codes:
                w.put(c, bbits)
        else:
            w.put(fs + 1, fsbits)
            for c in codes:
                w.put(1, (c >> fs) + 1)  # unary: zeros then a 1
                if fs:
                    w.put(c & ((1 << fs) - 1), fs)
    return w.bytes()


def _card(key, value, string=False):
    if string:
        body = f"'{value:<8}'"
    elif isinstance(value, bool):
        body = f"{'T' if value else 'F':>20}"
    elif isinstance(value, float):
        body = f'{value:>20.13G}'
    else:
        body = f'{value:>20}'
    return f'{key:<8}= {body}'.ljust(CARD).encode()


def _pad(b: bytes) -> bytes:
    return b + b'\0' * (-len(b) % BLOCK)


def _dither_randoms():
    """Independent implementation of the published cfitsio dither sequence
    (Pence, Seaman & White 2013 §4): Park-Miller minimal-standard LCG in
    EXACT integer arithmetic (the double-precision original is exact for
    m = 2^31-1, so the sequences are identical)."""
    seed, m = 1, 2147483647
    vals = []
    for _ in range(10000):
        seed = (16807 * seed) % m
        vals.append(seed / m)
    return np.asarray(vals)


class _DitherWalk:
    """Per-tile walker over the dither sequence, coded independently from
    data/fits.py: start index (zdither0 - 1 + row - 1) mod 10000; pixel
    pointer starts at int(rand[i0]*500) and reseeds on wrap. The pointer
    advances for EVERY pixel, including null/zero codes."""

    def __init__(self, zdither0, tile_row):
        self.rand = _dither_randoms()
        self.i0 = (zdither0 - 1 + tile_row - 1) % 10000
        self.ptr = int(self.rand[self.i0] * 500.0)

    def next(self):
        v = self.rand[self.ptr]
        self.ptr += 1
        if self.ptr == 10000:
            self.i0 = (self.i0 + 1) % 10000
            self.ptr = int(self.rand[self.i0] * 500.0)
        return v


def dither_quantize(tile, zscale, zzero, tile_row, zdither0,
                    method='SUBTRACTIVE_DITHER_1'):
    """Quantize one tile the cfitsio way; returns (int32 codes, the float64
    values cfitsio/astropy would decode back — the byte-exact ground truth).
    NaNs encode as the null code -2147483647; under DITHER_2, exact zeros
    encode as -2147483646 and decode to exactly 0.0."""
    flat = np.asarray(tile, np.float64).ravel()
    walk = _DitherWalk(zdither0, tile_row)
    codes = np.empty(flat.size, np.int32)
    truth = np.empty(flat.size, np.float64)
    for i, v in enumerate(flat):
        r = walk.next()
        if np.isnan(v):
            codes[i], truth[i] = -2147483647, np.nan
        elif method == 'SUBTRACTIVE_DITHER_2' and v == 0.0:
            codes[i], truth[i] = -2147483646, 0.0
        else:
            c = int(np.round((v - zzero) / zscale + r - 0.5))
            codes[i] = c
            truth[i] = (c - (r - 0.5)) * zscale + zzero
    return codes.reshape(np.shape(tile)), truth.reshape(np.shape(tile))


def write_tile_compressed(path, image, zcmptype='RICE_1', bytepix=None,
                          tile_rows=1, quantize=None, extra_cards=(),
                          dither=None, zdither0=1):
    """Test-side writer of a ZIMAGE bintable FITS: one tile per `tile_rows`
    image rows, optional float quantization with per-tile ZSCALE/ZZERO
    (+ optional subtractive dithering). With dither set, returns the
    float64 ground-truth image an exact cfitsio decode would produce."""
    image = np.asarray(image)
    h, wdt = image.shape
    if quantize is None:
        zbitpix = {np.dtype(np.int16): 16, np.dtype(np.int32): 32,
                   np.dtype(np.uint8): 8}[image.dtype]
        bytepix = bytepix or image.dtype.itemsize
    else:
        zbitpix = -32
        bytepix = 4

    truth = np.empty((h, wdt), np.float64) if dither else None
    tiles, scales = [], []
    for r0 in range(0, h, tile_rows):
        tile = image[r0:r0 + tile_rows]
        if quantize is not None:
            finite = tile[np.isfinite(tile)]
            zzero = float(finite.min()) if finite.size else 0.0
            zscale = float(quantize)
            if dither:
                ints, t = dither_quantize(tile, zscale, zzero,
                                          r0 // tile_rows + 1, zdither0,
                                          method=dither)
                truth[r0:r0 + tile_rows] = t
            else:
                ints = np.round((tile.astype(np.float64) - zzero)
                                / zscale).astype(np.int32)
            scales.append((zscale, zzero))
            tile = ints
        if zcmptype == 'RICE_1':
            tiles.append(rice_compress(tile, bytepix))
        elif zcmptype == 'GZIP_1':
            be = tile.astype(f'>i{tile.dtype.itemsize}')
            tiles.append(zlib.compress(be.tobytes()))
        else:
            raise ValueError(zcmptype)

    # heap: concatenated var-length arrays; table rows: P descriptor (+ D,D)
    heap = bytearray()
    rows = bytearray()
    for i, t in enumerate(tiles):
        rows += np.asarray([len(t), len(heap)], '>i4').tobytes()
        if quantize is not None:
            rows += np.asarray(scales[i], '>f8').tobytes()
        heap += t
    naxis1 = 8 + (16 if quantize is not None else 0)

    cards = [
        _card('XTENSION', 'BINTABLE', string=True),
        _card('BITPIX', 8), _card('NAXIS', 2),
        _card('NAXIS1', naxis1), _card('NAXIS2', len(tiles)),
        _card('PCOUNT', len(heap)), _card('GCOUNT', 1),
        _card('TFIELDS', 3 if quantize is not None else 1),
        _card('TTYPE1', 'COMPRESSED_DATA', string=True),
        _card('TFORM1', '1PB(%d)' % max(map(len, tiles)), string=True),
    ]
    if quantize is not None:
        cards += [_card('TTYPE2', 'ZSCALE', string=True),
                  _card('TFORM2', '1D', string=True),
                  _card('TTYPE3', 'ZZERO', string=True),
                  _card('TFORM3', '1D', string=True)]
    cards += [
        _card('ZIMAGE', True), _card('ZCMPTYPE', zcmptype, string=True),
        _card('ZBITPIX', zbitpix), _card('ZNAXIS', 2),
        _card('ZNAXIS1', wdt), _card('ZNAXIS2', h),
        _card('ZTILE1', wdt), _card('ZTILE2', tile_rows),
        _card('ZNAME1', 'BLOCKSIZE', string=True), _card('ZVAL1', 32),
        _card('ZNAME2', 'BYTEPIX', string=True), _card('ZVAL2', bytepix),
    ]
    if dither:
        cards += [_card('ZQUANTIZ', dither, string=True),
                  _card('ZDITHER0', zdither0)]
    for k, v in extra_cards:
        cards.append(_card(k, v, string=isinstance(v, str)))
    cards.append(b'END'.ljust(CARD))

    primary = _pad(b''.join([_card('SIMPLE', True), _card('BITPIX', 8),
                             _card('NAXIS', 0), _card('EXTEND', True),
                             b'END'.ljust(CARD)]))
    ext_header = _pad(b''.join(cards))
    data = _pad(bytes(rows) + bytes(heap))
    with open(path, 'wb') as f:
        f.write(primary + ext_header + data)
    return truth


@pytest.fixture
def image16():
    rng = np.random.default_rng(3)
    base = (rng.normal(1000, 40, (37, 64))).astype(np.int16)
    base[5:9, 10:30] = 12000  # bright active region: large diffs
    base[20] = base[20, 0]    # constant row: zero-entropy blocks
    return base


def test_rice_roundtrip_int16(tmp_path, image16):
    p = str(tmp_path / 'rice16.fits')
    write_tile_compressed(p, image16, extra_cards=(('WAVELNTH', 193),
                                                   ('BZERO', 0)))
    data, header = read_fits(p)
    np.testing.assert_array_equal(data, image16)
    assert header['WAVELNTH'] == 193
    assert header['NAXIS1'] == 64 and header['NAXIS2'] == 37


def test_rice_matches_uncompressed_twin(tmp_path, image16):
    """A compressed file and its plain twin read back identically."""
    plain, packed = str(tmp_path / 'a.fits'), str(tmp_path / 'b.fits')
    write_fits(plain, image16.astype(np.int32))
    write_tile_compressed(packed, image16.astype(np.int32), bytepix=4,
                          tile_rows=7)
    d_plain, _ = read_fits(plain)
    d_packed, _ = read_fits(packed)
    np.testing.assert_array_equal(d_packed, d_plain)


def test_rice_bzero_int16_unsigned(tmp_path, image16):
    """JSOC-style unsigned-int16 via BZERO=32768 applies after decompression."""
    p = str(tmp_path / 'rice_bzero.fits')
    write_tile_compressed(p, image16, extra_cards=(('BZERO', 32768.0),))
    data, _ = read_fits(p)
    np.testing.assert_allclose(data, image16.astype(np.float64) + 32768.0)


def test_gzip1_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    img = rng.integers(-500, 4000, (16, 24)).astype(np.int32)
    p = str(tmp_path / 'gz.fits')
    write_tile_compressed(p, img, zcmptype='GZIP_1', tile_rows=4)
    data, _ = read_fits(p)
    np.testing.assert_array_equal(data, img)


def test_rice_quantized_float(tmp_path):
    """Float image quantized with per-tile ZSCALE/ZZERO columns."""
    rng = np.random.default_rng(7)
    img = rng.uniform(0.0, 1.0, (12, 32)).astype(np.float32) * 50.0
    p = str(tmp_path / 'q.fits')
    write_tile_compressed(p, img, quantize=0.01, tile_rows=3)
    data, header = read_fits(p)
    assert data.dtype.kind == 'f'
    np.testing.assert_allclose(data, img, atol=0.0051)
    assert header['BITPIX'] == -32


def test_gzip_quantized_float(tmp_path):
    """Quantized float tiles under GZIP: codes are BYTEPIX-wide ints, NOT
    float bits (regression: ZBITPIX=-32 used to select '>f4' and skip the
    un-quantization entirely, yielding garbage)."""
    rng = np.random.default_rng(11)
    img = rng.uniform(0.0, 1.0, (12, 32)).astype(np.float32) * 50.0
    p = str(tmp_path / 'gq.fits')
    write_tile_compressed(p, img, zcmptype='GZIP_1', quantize=0.01,
                          tile_rows=3)
    data, header = read_fits(p)
    assert data.dtype.kind == 'f'
    np.testing.assert_allclose(data, img, atol=0.0051)


@pytest.mark.parametrize('zdither0', [1, 42, 9999])
def test_subtractive_dither1_byte_exact(tmp_path, zdither0):
    """SUBTRACTIVE_DITHER_1 decodes BYTE-EXACTLY: the reader reproduces
    cfitsio's seeded random sequence, validated against the independent
    in-test implementation of the same published algorithm (VERDICT r2 #4)."""
    rng = np.random.default_rng(13)
    img = rng.uniform(0.0, 1.0, (9, 32)).astype(np.float32)
    p = str(tmp_path / 'd1.fits')
    truth = write_tile_compressed(p, img, quantize=0.01, tile_rows=3,
                                  dither='SUBTRACTIVE_DITHER_1',
                                  zdither0=zdither0)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter('error')  # any dither warning -> failure
        data, _ = read_fits(p)
    np.testing.assert_array_equal(data, truth)  # bit-for-bit
    np.testing.assert_allclose(data, img, atol=0.0051)


def test_subtractive_dither2_zero_null_codes(tmp_path):
    """DITHER_2's reserved int32 codes: -2147483646 decodes to exactly 0.0
    and -2147483647 to NaN — NOT code*ZSCALE+ZZERO (ADVICE r2); the dither
    pointer still advances over them so later pixels stay byte-exact."""
    rng = np.random.default_rng(17)
    img = rng.uniform(0.5, 1.5, (6, 32)).astype(np.float32)
    img[1, 5] = 0.0
    img[2, 7] = np.nan
    img[4, 0] = 0.0
    p = str(tmp_path / 'd2.fits')
    truth = write_tile_compressed(p, img, quantize=0.01, tile_rows=2,
                                  dither='SUBTRACTIVE_DITHER_2', zdither0=7)
    data, _ = read_fits(p)
    assert data[1, 5] == 0.0 and data[4, 0] == 0.0
    assert np.isnan(data[2, 7])
    np.testing.assert_array_equal(data, truth)


def test_dither_long_tile_wraps_sequence(tmp_path):
    """A tile longer than the remaining random table (>10000 px from a late
    start) exercises the wrap/reseed path byte-exactly."""
    rng = np.random.default_rng(19)
    img = rng.uniform(0.0, 4.0, (2, 8192)).astype(np.float32)
    p = str(tmp_path / 'dw.fits')
    truth = write_tile_compressed(p, img, quantize=0.004, tile_rows=1,
                                  dither='SUBTRACTIVE_DITHER_1',
                                  zdither0=9973)
    data, _ = read_fits(p)
    np.testing.assert_array_equal(data, truth)


def test_quantized_dither_fallbacks(tmp_path):
    """Dither without ZDITHER0 (non-conformant) warns + decodes within one
    step; unknown ZQUANTIZ values are rejected outright."""
    rng = np.random.default_rng(13)
    img = rng.uniform(0.0, 1.0, (6, 32)).astype(np.float32)
    p = str(tmp_path / 'dnoseed.fits')
    write_tile_compressed(p, img, quantize=0.01, tile_rows=3,
                          extra_cards=(('ZQUANTIZ', 'SUBTRACTIVE_DITHER_1'),))
    with pytest.warns(UserWarning, match='ZDITHER0'):
        data, _ = read_fits(p)
    np.testing.assert_allclose(data, img, atol=0.011)  # one extra step

    p2 = str(tmp_path / 'dx.fits')
    write_tile_compressed(p2, img, quantize=0.01, tile_rows=3,
                          extra_cards=(('ZQUANTIZ', 'MYSTERY_9'),))
    with pytest.raises(NotImplementedError, match='ZQUANTIZ'):
        read_fits(p2)


def test_compressed_bintable_without_zimage_rejected(tmp_path, image16):
    """A BINTABLE carrying COMPRESSED_DATA but no ZIMAGE keyword must raise,
    not silently return no data."""
    p = str(tmp_path / 'noz.fits')
    write_tile_compressed(p, image16)
    raw = open(p, 'rb').read()
    # overwrite the ZIMAGE card with a comment, preserving record layout
    zcard = _card('ZIMAGE', True)
    assert zcard in raw
    raw = raw.replace(zcard, b'COMMENT removed'.ljust(CARD))
    open(p, 'wb').write(raw)
    with pytest.raises(NotImplementedError, match='ZIMAGE'):
        read_fits(p)


def test_python_fallback_matches_native(image16):
    """The pure-Python decoder and the C++ decoder agree bit-for-bit."""
    from sunerf_tpu import native
    stream = rice_compress(image16, bytepix=2)
    npix = image16.size
    py = native._rice_decode_py(stream, npix, 2, 32)
    lib = native._load_library()
    if lib is None:
        pytest.skip('no native toolchain')
    nat = native.rice_decode(stream, npix, 2, 32)
    np.testing.assert_array_equal(py, nat)
    np.testing.assert_array_equal(nat, image16.ravel())


@pytest.mark.parametrize('bytepix', [1, 2, 4])
def test_rice_bytepix_widths(bytepix):
    from sunerf_tpu.native import rice_decode
    rng = np.random.default_rng(bytepix)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[bytepix]
    lo, hi = (0, 255) if bytepix == 1 else (-2000, 2000)
    pix = rng.integers(lo, hi, 301).astype(dtype)
    out = rice_decode(rice_compress(pix, bytepix), 301, bytepix)
    np.testing.assert_array_equal(out, pix)


def test_external_astropy_written_fits():
    """A FITS file written by astropy (bundled with numpy's test suite) —
    the only third-party-written FITS available offline. Caught a real bug:
    string values padded before their / comment ('BINTABLE'   / ...) kept
    their quotes, so BINTABLE extensions were misparsed as byte images."""
    import os
    candidates = [
        '/usr/lib/python3/dist-packages/numpy/core/tests/data/'
        'recarray_from_file.fits']
    try:
        import numpy as _np
        candidates.append(os.path.join(os.path.dirname(_np.__file__),
                                       '_core', 'tests', 'data',
                                       'recarray_from_file.fits'))
        candidates.append(os.path.join(os.path.dirname(_np.__file__),
                                       'core', 'tests', 'data',
                                       'recarray_from_file.fits'))
    except ImportError:
        pass
    path = next((p for p in candidates if os.path.exists(p)), None)
    if path is None:
        pytest.skip('no external FITS fixture on this system')
    data, header = read_fits(path, hdu=1)
    assert header['XTENSION'] == 'BINTABLE'   # quotes/padding stripped
    assert header['TFIELDS'] == 3
    assert header['TTYPE1'] == 'a'
    assert data is None                       # plain bintable, not an image
    # whole-file scan (hdu=None) must not misreport table bytes as an image
    d0, _ = read_fits(path)
    assert d0 is None


def test_string_card_with_padding_and_comment(tmp_path):
    """Round-trip our own writer + a hand-built padded string card."""
    img = np.arange(6, dtype=np.int32).reshape(2, 3)
    p = str(tmp_path / 's.fits')
    write_fits(p, img, header={'TELESCOP': 'SDO/AIA', 'WAVELNTH': 193})
    raw = bytearray(open(p, 'rb').read())
    card = "INSTRUME= 'AIA_3   '           / instrument name".ljust(CARD)
    end = raw.find(b'END'.ljust(CARD))
    raw[end:end + CARD] = card.encode()
    raw[end + CARD:end + 2 * CARD] = b'END'.ljust(CARD)
    # grow to the next 2880 boundary if END spilled into a new block
    open(p, 'wb').write(bytes(raw))
    data, h = read_fits(p)
    assert h['INSTRUME'] == 'AIA_3'
    assert h.comments['INSTRUME'] == 'instrument name'
    np.testing.assert_array_equal(data, img)


def test_header_oddities_do_not_crash(tmp_path):
    """Real-archive header quirks parse gracefully: CONTINUE long strings
    (value preserved up to the first card), blank keywords, COMMENT floods,
    lowercase exponents, and D-exponent floats."""
    img = np.ones((2, 2), dtype=np.int32)
    p = str(tmp_path / 'odd.fits')
    write_fits(p, img)
    raw = bytearray(open(p, 'rb').read())
    cards = [
        "LONGSTR = 'this is a very long &'  / part one",
        "CONTINUE  'second part'            / continuation",
        "        ",  # blank keyword card
        "COMMENT  FITS (Flexible Image Transport System) format is defined",
        "DVAL    =        1.23456789D+02 / double with D exponent",
        "EVAL    =              1.5e-03 / lowercase exponent",
    ]
    end = raw.find(b'END'.ljust(CARD))
    insert = b''.join(c.ljust(CARD).encode() for c in cards)
    raw[end:end] = insert
    blob = bytes(raw)
    # re-pad the header to a 2880 boundary
    hdr_end = blob.find(b'END'.ljust(CARD)) + CARD
    data_start = len(open(p, 'rb').read()) - img.nbytes - \
        (-img.nbytes % BLOCK)
    header = blob[:hdr_end]
    header += b' ' * (-len(header) % BLOCK)
    body = open(p, 'rb').read()[BLOCK * ((data_start + BLOCK - 1) // BLOCK):]
    open(p, 'wb').write(header + body)

    data, h = read_fits(p)
    np.testing.assert_array_equal(data, img)
    assert h['DVAL'] == pytest.approx(123.456789)
    assert h['EVAL'] == pytest.approx(1.5e-03)
    assert h['LONGSTR'].startswith('this is a very long')
