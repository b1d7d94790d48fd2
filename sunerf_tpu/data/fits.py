"""Minimal native FITS reader/writer (no astropy in this environment).

Supports what the SuNeRF data layer needs: plain image HDUs (primary +
IMAGE extensions), BITPIX 8/16/32/64/-32/-64, BSCALE/BZERO, header
round-tripping, and tile-compressed (ZIMAGE) extensions with RICE_1 (native
C++ decoder, sunerf_tpu/native) or GZIP_1/GZIP_2 tiles — JSOC exports and
SECCHI archives are routinely Rice-compressed. Unknown compressions are
rejected with a clear error.

The reference reads/writes FITS exclusively through sunpy/astropy
(sunerf/data/utils.py, data/prep/*.py, evaluation/image_render.py:93-144);
here the format layer is self-contained so the offline pipeline runs on a
bare TPU VM image.
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

BLOCK = 2880
CARD = 80

_BITPIX_DTYPES = {
    8: np.dtype('>u1'), 16: np.dtype('>i2'), 32: np.dtype('>i4'),
    64: np.dtype('>i8'), -32: np.dtype('>f4'), -64: np.dtype('>f8'),
}
# string values may be padded with blanks before an optional / comment
# (astropy/cfitsio write "'BINTABLE'           / binary table extension")
_VALUE_RE = re.compile(r"^(?:'(?P<str>(?:[^']|'')*)'\s*|(?P<val>[^/]*))(?:/(?P<comment>.*))?$")


@dataclass
class Header:
    """Ordered FITS header: keyword -> parsed value (str/int/float/bool)."""
    cards: dict = field(default_factory=dict)
    comments: dict = field(default_factory=dict)

    def __getitem__(self, key):
        return self.cards[key.upper()]

    def __setitem__(self, key, value):
        self.cards[key.upper()] = value

    def __contains__(self, key):
        return key.upper() in self.cards

    def get(self, key, default=None):
        return self.cards.get(key.upper(), default)

    def update(self, other):
        for k, v in (other.cards if isinstance(other, Header) else other).items():
            self[k] = v


def _parse_value(raw: str):
    raw = raw.strip()
    if not raw:
        return None
    m = _VALUE_RE.match(raw)
    if m and m.group('str') is not None:
        return m.group('str').replace("''", "'").rstrip()
    val = (m.group('val') if m else raw).strip()
    if val == 'T':
        return True
    if val == 'F':
        return False
    try:
        if re.fullmatch(r'[+-]?\d+', val):
            return int(val)
        return float(val.replace('D', 'E').replace('d', 'e'))
    except ValueError:
        return val


def _parse_header(block_data: bytes) -> tuple[Header, int]:
    """Parse header cards until END; returns (header, bytes consumed)."""
    header = Header()
    offset = 0
    while True:
        if offset + BLOCK > len(block_data):
            raise ValueError('FITS header missing END card')
        block = block_data[offset:offset + BLOCK]
        offset += BLOCK
        done = False
        for i in range(0, BLOCK, CARD):
            card = block[i:i + CARD].decode('latin-1')
            key = card[:8].strip()
            if key == 'END':
                done = True
                break
            if not key or key in ('COMMENT', 'HISTORY'):
                continue
            if card[8:10] == '= ':
                body = card[10:]
                m = _VALUE_RE.match(body.strip())
                header.cards[key] = _parse_value(body)
                if m and m.group('comment'):
                    header.comments[key] = m.group('comment').strip()
        if done:
            break
    return header, offset


def _data_size(header: Header) -> int:
    naxis = header.get('NAXIS', 0)
    if naxis == 0:
        return 0
    n = 1
    for i in range(1, naxis + 1):
        n *= header[f'NAXIS{i}']
    # standard FITS size formula; PCOUNT covers the bintable heap
    return (abs(header['BITPIX']) // 8) * header.get('GCOUNT', 1) * (
        header.get('PCOUNT', 0) + n)


# ------------------------------------------------- tiled-image decompression

# cfitsio's subtractive-dither machinery (the FITS tiled-image convention,
# Pence/Seaman/White 2013 §4; same fixed published algorithm astropy
# implements, which is how the reference reads these files —
# sunerf/data/utils.py:54-71): a 10000-entry Park-Miller minimal-standard
# LCG sequence (seed 1, a=16807, m=2^31-1), with each tile's starting
# position derived from ZDITHER0 + the tile number.
_N_RANDOM = 10000
_ZERO_VALUE = -2147483646   # SUBTRACTIVE_DITHER_2: int32 code for exactly 0.0
_NULL_VALUE = -2147483647   # default integer code for null (NaN) pixels
_fits_rand_cache = None


def _fits_rand() -> np.ndarray:
    global _fits_rand_cache
    if _fits_rand_cache is None:
        a, m = 16807.0, 2147483647.0
        seed = 1.0
        vals = np.empty(_N_RANDOM, np.float64)
        for i in range(_N_RANDOM):
            temp = a * seed
            seed = temp - m * float(int(temp / m))
            vals[i] = seed / m
        _fits_rand_cache = vals
    return _fits_rand_cache


def _dither_offsets(zdither0: int, tile_row: int, npix: int) -> np.ndarray:
    """Per-pixel dither offsets (rand - 0.5) for 1-based tile number
    `tile_row`, reproducing cfitsio's unquantize loop: iseed walks the random
    table from (ZDITHER0 - 1 + row - 1) mod N; the pixel pointer starts at
    int(rand[iseed]*500) and re-seeds from the next iseed when it wraps."""
    rand = _fits_rand()
    iseed = (int(zdither0) - 1 + tile_row - 1) % _N_RANDOM
    nextrand = int(rand[iseed] * 500.0)
    out = np.empty(npix, np.float64)
    i = 0
    while i < npix:
        n = min(_N_RANDOM - nextrand, npix - i)
        out[i:i + n] = rand[nextrand:nextrand + n]
        i += n
        iseed = (iseed + 1) % _N_RANDOM
        nextrand = int(rand[iseed] * 500.0)
    return out - 0.5


_TFORM_RE = re.compile(r'^(\d*)([PQ]?)([LXBIJKAEDCM])')
_TFORM_SIZES = {'L': 1, 'X': 1, 'B': 1, 'I': 2, 'J': 4, 'K': 8, 'A': 1,
                'E': 4, 'D': 8, 'C': 8, 'M': 16}


def _bintable_columns(header: Header) -> dict:
    """TTYPE -> (byte offset in row, descriptor ''/'P'/'Q', base code)."""
    cols, offset = {}, 0
    for j in range(1, header.get('TFIELDS', 0) + 1):
        m = _TFORM_RE.match(str(header[f'TFORM{j}']).strip())
        if not m:
            raise ValueError(f'bad TFORM{j}: {header[f"TFORM{j}"]!r}')
        repeat = int(m.group(1)) if m.group(1) else 1
        desc, code = m.group(2), m.group(3)
        name = str(header.get(f'TTYPE{j}', f'COL{j}')).strip().upper()
        cols[name] = (offset, desc, code)
        offset += repeat * (8 if desc == 'P' else 16 if desc == 'Q'
                            else _TFORM_SIZES[code])
    return cols


def _heap_slice(row: bytes, col, heap: bytes) -> bytes:
    """Variable-length array bytes for one row's P/Q descriptor column."""
    offset, desc, code = col
    if desc == 'Q':
        n, off = np.frombuffer(row, '>i8', count=2, offset=offset)
    else:
        n, off = np.frombuffer(row, '>i4', count=2, offset=offset)
    return heap[off:off + int(n) * _TFORM_SIZES[code]]


def _scalar_at(row: bytes, col) -> float:
    offset, _, code = col
    return float(np.frombuffer(row, {'E': '>f4', 'D': '>f8', 'J': '>i4',
                                     'K': '>i8', 'I': '>i2'}[code],
                               count=1, offset=offset)[0])


def _decompress_tiled(header: Header, raw: bytes, path: str):
    """Decompress a ZIMAGE bintable HDU into (image array, image header) —
    the FITS tiled-image convention (RICE_1 / GZIP_1 / GZIP_2 / NOCOMPRESS).
    The reference reads these through astropy (sunerf/data/utils.py:54-71)."""
    from sunerf_tpu.native import rice_decode

    naxis1, nrows = header['NAXIS1'], header['NAXIS2']
    theap = header.get('THEAP', naxis1 * nrows)
    heap = raw[theap:]
    cols = _bintable_columns(header)

    zbitpix = header['ZBITPIX']
    znaxis = header['ZNAXIS']
    zdims = [header[f'ZNAXIS{i}'] for i in range(1, znaxis + 1)]  # ax1 first
    ztile = [header.get(f'ZTILE{i}', zdims[0] if i == 1 else 1)
             for i in range(1, znaxis + 1)]
    ntiles = [-(-d // t) for d, t in zip(zdims, ztile)]
    if int(np.prod(ntiles)) != nrows:
        raise ValueError(f'{path}: tile grid {ntiles} != NAXIS2 {nrows}')

    zvals = {}
    k = 1
    while f'ZNAME{k}' in header:
        zvals[str(header[f'ZNAME{k}']).strip().upper()] = header.get(f'ZVAL{k}')
        k += 1
    zcmptype = str(header.get('ZCMPTYPE', 'RICE_1')).strip().upper()
    if zcmptype not in ('RICE_1', 'RICE_ONE', 'GZIP_1', 'GZIP_2',
                        'NOCOMPRESS'):
        raise NotImplementedError(
            f'{path}: ZCMPTYPE {zcmptype!r} not supported (RICE_1/GZIP only)')
    blocksize = int(zvals.get('BLOCKSIZE', 32))
    bytepix = int(zvals.get('BYTEPIX', 4 if zbitpix < 0 else abs(zbitpix) // 8))

    quantized = zbitpix < 0 and ('ZSCALE' in cols or 'ZZERO' in cols
                                 or 'ZSCALE' in header)
    zquantiz = str(header.get('ZQUANTIZ', 'NO_DITHER')).strip().upper()
    if quantized and zquantiz not in ('NO_DITHER', 'SUBTRACTIVE_DITHER_1',
                                      'SUBTRACTIVE_DITHER_2'):
        raise NotImplementedError(f'{path}: ZQUANTIZ {zquantiz!r} unknown')
    dithered = quantized and zquantiz != 'NO_DITHER'
    zdither0 = header.get('ZDITHER0')
    if dithered and zdither0 is None:
        # non-conformant file: dithered but no stored seed — decode without
        # offsets (each pixel then within one quantization step of the truth)
        import warnings
        warnings.warn(f'{path}: {zquantiz} without ZDITHER0 — decoded '
                      f'without dither offsets (error bounded by one '
                      f'quantization step)')
        dithered = False
    if quantized:
        # quantized float images store BYTEPIX-wide integer codes
        int_dtype = {1: '>i1', 2: '>i2', 4: '>i4', 8: '>i8'}[bytepix]
    else:
        int_dtype = {8: '>u1', 16: '>i2', 32: '>i4', 64: '>i8',
                     -32: '>f4', -64: '>f8'}[zbitpix]
    out_dtype = np.float64 if (quantized or zbitpix < 0) else \
        _BITPIX_DTYPES[zbitpix].newbyteorder('=')
    out = np.zeros(tuple(reversed(zdims)), out_dtype)

    for r in range(nrows):
        row = raw[r * naxis1:(r + 1) * naxis1]
        # tile coordinates: first FITS axis varies fastest
        rem, coords = r, []
        for n in ntiles:
            coords.append(rem % n)
            rem //= n
        lens = [min(t, d - c * t) for c, t, d in zip(coords, ztile, zdims)]
        npix = int(np.prod(lens))

        tile = None
        cdata = _heap_slice(row, cols['COMPRESSED_DATA'], heap) \
            if 'COMPRESSED_DATA' in cols else b''
        if cdata and zcmptype in ('RICE_1', 'RICE_ONE'):
            tile = rice_decode(cdata, npix, bytepix, blocksize)
        elif cdata and zcmptype in ('GZIP_1', 'GZIP_2'):
            tile = _gunzip_tile(cdata, npix, int_dtype, zcmptype)
        elif cdata and zcmptype == 'NOCOMPRESS':
            tile = np.frombuffer(cdata, int_dtype, count=npix)
        elif 'GZIP_COMPRESSED_DATA' in cols:
            gz = _heap_slice(row, cols['GZIP_COMPRESSED_DATA'], heap)
            if gz:
                tile = _gunzip_tile(gz, npix, int_dtype, 'GZIP_1')
        if tile is None and 'UNCOMPRESSED_DATA' in cols:
            un = _heap_slice(row, cols['UNCOMPRESSED_DATA'], heap)
            if un:
                tile = np.frombuffer(un, int_dtype, count=npix)
        if tile is None:
            raise ValueError(f'{path}: tile {r} has no compressed data')

        if quantized and tile.dtype.kind != 'f':
            zscale = _scalar_at(row, cols['ZSCALE']) if 'ZSCALE' in cols \
                else float(header.get('ZSCALE', 1.0))
            zzero = _scalar_at(row, cols['ZZERO']) if 'ZZERO' in cols \
                else float(header.get('ZZERO', 0.0))
            codes = tile.astype(np.int64)
            if dithered:
                offs = _dither_offsets(zdither0, r + 1, npix)
                tile = (codes - offs) * zscale + zzero
            else:
                tile = codes * zscale + zzero
            # reserved int32 codes (cfitsio quantize.c): ZBLANK-declared
            # nulls -> NaN; under SUBTRACTIVE_DITHER_2 both -2147483647
            # (null) and -2147483646 (exact 0.0) are reserved uncondition-
            # ally. Decoding them as code*ZSCALE+ZZERO yields huge wrong
            # values (ADVICE r2).
            if bytepix == 4:
                zblank = _scalar_at(row, cols['ZBLANK']) if 'ZBLANK' in cols \
                    else header.get('ZBLANK')
                if zblank is None and zquantiz == 'SUBTRACTIVE_DITHER_2':
                    zblank = _NULL_VALUE
                if zblank is not None:
                    tile = np.where(codes == int(zblank), np.nan, tile)
                if zquantiz == 'SUBTRACTIVE_DITHER_2':
                    tile = np.where(codes == _ZERO_VALUE, 0.0, tile)

        idx = tuple(slice(c * t, c * t + n)
                    for c, t, n in zip(coords, ztile, lens))[::-1]
        out[idx] = tile.reshape(tuple(reversed(lens)))

    img_header = Header()
    skip = {'XTENSION', 'BITPIX', 'NAXIS', 'PCOUNT', 'GCOUNT', 'TFIELDS',
            'THEAP', 'ZIMAGE', 'ZCMPTYPE', 'ZBITPIX', 'ZNAXIS', 'ZQUANTIZ',
            'ZDITHER0', 'ZSIMPLE', 'ZTENSION', 'ZEXTEND', 'ZPCOUNT',
            'ZGCOUNT', 'ZHECKSUM', 'ZDATASUM'}
    for key, value in header.cards.items():
        if key in skip or re.match(r'^(NAXIS|ZNAXIS|ZTILE|ZNAME|ZVAL|TTYPE|'
                                   r'TFORM|TUNIT|TDIM|TSCAL|TZERO)\d+$', key):
            continue
        img_header[key] = value
    img_header['BITPIX'] = zbitpix
    img_header['NAXIS'] = znaxis
    for i, d in enumerate(zdims, start=1):
        img_header[f'NAXIS{i}'] = d

    bscale = img_header.get('BSCALE', 1)
    bzero = img_header.get('BZERO', 0)
    if bscale != 1 or bzero != 0:
        out = out.astype(np.float64) * bscale + bzero
    return np.ascontiguousarray(out), img_header


def _gunzip_tile(data: bytes, npix: int, int_dtype: str,
                 zcmptype: str) -> np.ndarray:
    import zlib
    buf = zlib.decompressobj(32 + 15).decompress(data)
    itemsize = np.dtype(int_dtype).itemsize
    if len(buf) < npix * itemsize:
        # gzip fallback tiles may hold smaller ints than ZBITPIX
        itemsize = len(buf) // npix
        int_dtype = int_dtype[0] + ('i' if int_dtype[1] != 'u' else 'u') + \
            str(itemsize)
    arr = np.frombuffer(buf, int_dtype, count=npix)
    if zcmptype == 'GZIP_2':
        # byte-shuffled: all MSBs first, then next byte plane, ...
        shuffled = np.frombuffer(buf[:npix * itemsize], np.uint8)
        arr = shuffled.reshape(itemsize, npix).T.copy().view(
            int_dtype).reshape(npix)
    return arr


def read_fits(path: str, hdu: int | None = None):
    """Read a FITS file.

    Args:
        hdu: index of the HDU to return; None returns the first HDU that has
            image data (many solar FITS put the image in extension 1).

    Returns:
        (data, header): data is a numpy array in native byte order (None for
        headerless HDUs), header a Header.
    """
    with open(path, 'rb') as f:
        buf = f.read()

    hdus = []
    offset = 0
    while offset < len(buf):
        header, consumed = _parse_header(buf[offset:])
        offset += consumed
        nbytes = _data_size(header)
        data = None
        if nbytes:
            if header.get('XTENSION', '').strip() == 'BINTABLE':
                if header.get('ZIMAGE'):
                    data, header = _decompress_tiled(
                        header, buf[offset:offset + nbytes], path)
                else:
                    ttypes = [str(v) for k, v in header.cards.items()
                              if k.startswith('TTYPE')]
                    if any('COMPRESSED' in t.upper() for t in ttypes):
                        raise NotImplementedError(
                            f'{path}: compressed BINTABLE without ZIMAGE '
                            f'keyword is not supported')
            else:
                dtype = _BITPIX_DTYPES[header['BITPIX']]
                shape = tuple(header[f'NAXIS{i}']
                              for i in range(header['NAXIS'], 0, -1))
                data = np.frombuffer(buf, dtype, count=nbytes // dtype.itemsize,
                                     offset=offset).reshape(shape)
                bscale = header.get('BSCALE', 1)
                bzero = header.get('BZERO', 0)
                if bscale != 1 or bzero != 0:
                    data = data.astype(np.float64) * bscale + bzero
                data = np.ascontiguousarray(
                    data.astype(data.dtype.newbyteorder('=')))
            offset += (nbytes + BLOCK - 1) // BLOCK * BLOCK
        hdus.append((data, header))
        if hdu is not None and len(hdus) > hdu:
            break

    if hdu is not None:
        return hdus[hdu]
    for data, header in hdus:
        if data is not None:
            return data, header
    return hdus[0]


def _format_card(key: str, value, comment: str = '') -> bytes:
    key = key.upper()[:8]
    if isinstance(value, bool):
        val = 'T' if value else 'F'
        body = f'{val:>20}'
    elif isinstance(value, (int, np.integer)):
        body = f'{int(value):>20}'
    elif isinstance(value, (float, np.floating)):
        body = f'{float(value):>20.13G}'
    elif value is None:
        body = ' ' * 20
    else:
        s = str(value).replace("'", "''")
        body = f"'{s:<8}'"
    card = f'{key:<8}= {body}'
    if comment:
        card += f' / {comment}'
    return card[:CARD].ljust(CARD).encode('latin-1')


def write_fits(path: str, data: np.ndarray, header: Header | dict | None = None,
               overwrite: bool = True):
    """Write a single-HDU FITS file (float32 by default for float input)."""
    import os
    if os.path.exists(path) and not overwrite:
        raise FileExistsError(path)

    if data.dtype.kind == 'f':
        out = data.astype('>f4')
        bitpix = -32
    elif data.dtype.kind in 'iu':
        out = data.astype('>i4')
        bitpix = 32
    else:
        raise TypeError(f'unsupported dtype {data.dtype}')

    cards = [
        _format_card('SIMPLE', True, 'conforms to FITS standard'),
        _format_card('BITPIX', bitpix),
        _format_card('NAXIS', data.ndim),
    ]
    for i, n in enumerate(reversed(data.shape), start=1):
        cards.append(_format_card(f'NAXIS{i}', n))

    items = []
    if header is not None:
        items = (header.cards if isinstance(header, Header) else header).items()
    reserved = {'SIMPLE', 'BITPIX', 'NAXIS', 'END', 'BSCALE', 'BZERO',
                'XTENSION', 'PCOUNT', 'GCOUNT'} | {
                    f'NAXIS{i}' for i in range(1, 10)}
    for k, v in items:
        if k.upper() not in reserved:
            cards.append(_format_card(k, v))
    cards.append('END'.ljust(CARD).encode('latin-1'))

    header_bytes = b''.join(cards)
    header_bytes += b' ' * (-len(header_bytes) % BLOCK)
    data_bytes = out.tobytes()
    data_bytes += b'\0' * (-len(data_bytes) % BLOCK)

    with open(path, 'wb') as f:
        f.write(header_bytes)
        f.write(data_bytes)
