"""Minimal native FITS reader/writer (no astropy in this environment).

Supports what the SuNeRF data layer needs: plain image HDUs (primary +
IMAGE extensions), BITPIX 8/16/32/64/-32/-64, BSCALE/BZERO, header
round-tripping. Compressed (Rice/BINTABLE) HDUs are detected and rejected
with a clear error.

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
_VALUE_RE = re.compile(r"^(?:'(?P<str>(?:[^']|'')*)'|(?P<val>[^/]*))(?:/(?P<comment>.*))?$")


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
    n = abs(header['BITPIX']) // 8
    for i in range(1, naxis + 1):
        n *= header[f'NAXIS{i}']
    return n


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
                ttypes = [str(header.get(f'TTYPE{i}', ''))
                          for i in range(1, header.get('TFIELDS', 0) + 1)]
                if any('COMPRESSED' in t.upper() for t in ttypes) \
                        or 'ZIMAGE' in header:
                    raise NotImplementedError(
                        f'{path}: tile-compressed FITS not supported; '
                        'decompress offline (e.g. funpack) first')
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
