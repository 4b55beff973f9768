"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are treated as ``binary`` columns with metadata
structs; the Spark-side plumbing (schemas, Arrow batch shapes,
partition-friendly mapInPandas transforms) is real and tested.

Decode support is real where a pure-stdlib/NumPy decoder exists and
honestly stubbed where it does not (this container ships no codec
libraries):

* **images** - PPM (P6), PGM (P5), uncompressed BMP (8-bit palette /
  24-bit BGR), PNG (every legal depth/color combination - gray
  1/2/4/8/16, palette 1/2/4/8, gray+alpha/RGB/RGBA 8/16 -
  including Adam7 interlacing; zlib is stdlib and the filters/pass
  grids are public spec), GIF87a/89a (full variable-width LZW,
  local/global palettes, 4-pass interlacing; first frame) and
  JPEG - baseline AND progressive (full ITU-T T.81 Huffman entropy
  decode incl. successive approximation and EOB runs, restart
  markers, any sampling, float IDCT - pure NumPy) - decode for real
  (:func:`decode_image`); what still raises ``NotImplementedError``
  is down to arithmetic-coded JPEG, TIFF and WebP.
* **audio** - PCM WAV decodes for real via the stdlib ``wave``
  module (:func:`decode_audio`); compressed codecs raise.
* **video** - uncompressed 24-bit AVI frames decode for real via
  pure RIFF parsing (:func:`decode_video_frames` /
  :func:`video_frame_features`); entropy-coded containers
  (MP4/MKV/WebM, compressed AVI) raise - that part stays the
  declared environment ceiling, and :func:`frame_sample` remains
  the metadata-only sampling path.

``use_fake_decoder=True`` keeps the deterministic payload-digest fake
for offline plumbing tests.  ``synth_media_real`` generates genuine
P6/PGM/BMP/WAV/AVI payloads so the real decoders are exercised end to
end without any external data.

``html_to_text`` is fully real: it extracts indexable text from HTML
bytes with the tokenizer kernel (tags stripped, <script>/<style>
bodies suppressed), i.e. the same byte-identical extraction the
full-text pipeline guarantees per url.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..kernel.fsm import SPACE_T, TAG_T
from ..kernel.tokenizer import tokenize

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "sample_rate int, n_frames int"
)


def html_to_text(docs: DataFrame, html_col: str = "html", out_col: str = "text_extracted") -> DataFrame:
    """Extract visible text from HTML bytes (tags/script/style dropped)."""

    def gen(batches):
        for pdf in batches:
            outs = []
            for raw in pdf[html_col].tolist():
                if raw is None:
                    outs.append(None)
                    continue
                s = bytes(raw).decode("utf-8", "replace")
                outs.append(_visible_text(s))
            pdf = pdf.copy()
            pdf[out_col] = outs
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
    ) + f", {out_col} string"
    return docs.mapInPandas(gen, schema)


def _visible_text(s: str) -> str:
    """Byte-faithful visible text: the source minus tag spans and
    script/style bodies.  Token spans are merged (CJK 2-grams, url and
    hyphenated-word composites overlap their parts) so nothing is
    duplicated; inter-word blanks survive verbatim."""
    segs: list[list[int]] = []
    skip = False
    for st, ln, tt in tokenize(s):
        if tt == TAG_T:
            tl = s[st : st + ln].lower()
            if tl.startswith(("<script", "<style")):
                skip = True
            elif tl.startswith(("</script", "</style")):
                skip = False
            continue
        if skip or ln == 0:
            continue
        end = st + ln
        if segs and st <= segs[-1][1]:
            if end > segs[-1][1]:
                segs[-1][1] = end
        else:
            segs.append([st, end])
    return "".join(s[a:b] for a, b in segs).strip()


def _pnm_header(b: bytes, n_fields: int):
    """Parse a PNM ASCII header after the 2-byte magic: ``n_fields``
    whitespace-separated ints with ``#`` comments; returns
    (values, data_offset) - offset is one byte past the single
    whitespace that terminates the last header field."""
    i = 2
    vals: list[int] = []
    while len(vals) < n_fields:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        vals.append(int(b[i:j]))
        i = j
    return vals, i + 1


def _luma(rgb: np.ndarray) -> np.ndarray:
    """Integer Rec.601 luma, the common thumbnail-gray convention."""
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    bl = rgb[..., 2].astype(np.uint32)
    return ((r * 299 + g * 587 + bl * 114) // 1000).astype(np.uint8)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# samples per pixel for the non-palette PNG color types (type 3 =
# palette carries 1 index sample; handled separately in _decode_png)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}

# Adam7 pass grid: (x_start, y_start, x_step, y_step), spec 8.2
_PNG_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_chunks(b: bytes):
    """Yield (type, data) for each chunk, CRC-verified.  Truncation
    or a CRC mismatch raises ``ValueError`` (malformed payload of a
    supported container)."""
    import zlib

    off = 8
    while off < len(b):
        if len(b) - off < 8:
            raise ValueError("truncated PNG chunk header")
        n = int.from_bytes(b[off : off + 4], "big")
        ctype = b[off + 4 : off + 8]
        if len(b) - off < 12 + n:
            raise ValueError("truncated PNG chunk data")
        data = b[off + 8 : off + 8 + n]
        crc = int.from_bytes(b[off + 8 + n : off + 12 + n], "big")
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError("PNG chunk CRC mismatch")
        yield ctype, data
        if ctype == b"IEND":
            return
        off += 12 + n
    raise ValueError("PNG ended without IEND")


def _png_unfilter(raw: bytes, w: int, h: int, ch: int) -> np.ndarray:
    """Reverse the per-scanline PNG filters (spec 9: None/Sub/Up/
    Average/Paeth).  None/Up are whole-row NumPy ops; Sub is a
    per-channel-lane mod-256 prefix sum (cumsum & 0xFF - mod is
    linear, so the wraparound distributes); Average/Paeth recur on
    decoded left bytes, so they loop - over Python LISTS, whose
    C-speed indexing measured ~11x faster than the same loop over
    numpy scalars (libpng emits filters 1/3/4 on nearly every row of
    photographic images, so these paths carry real payloads).

    ``ch`` is really the filter's BYTES-PER-PIXEL (the spec's bpp:
    the left-neighbor byte offset).  Callers with sub-byte or
    multi-byte samples pass w=row-bytes/bpp accordingly: palette and
    depth<8 rows are (rowbytes, bpp=1); 16-bit rows are
    (w, bpp=2*channels)."""
    stride = w * ch
    arr = np.frombuffer(raw, np.uint8).reshape(h, 1 + stride)
    ftypes = arr[:, 0]
    out = np.empty((h, stride), np.int64)
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        f = int(ftypes[y])
        row = arr[y, 1:].astype(np.int64)
        if f == 0:
            pass
        elif f == 2:  # Up
            row = (row + prev) & 0xFF
        elif f == 1:  # Sub: per-lane prefix sum mod 256
            row = np.cumsum(row.reshape(w, ch), axis=0, dtype=np.int64)
            row = (row & 0xFF).reshape(stride)
        elif f == 3:  # Average
            r = row.tolist()
            pv = prev.tolist()
            for x in range(ch):  # left pixel is 0
                r[x] = (r[x] + (pv[x] >> 1)) & 0xFF
            for x in range(ch, stride):
                r[x] = (r[x] + ((r[x - ch] + pv[x]) >> 1)) & 0xFF
            row = np.array(r, np.int64)
        elif f == 4:  # Paeth
            r = row.tolist()
            pv = prev.tolist()
            for x in range(ch):  # a = c = 0 -> predictor is up
                r[x] = (r[x] + pv[x]) & 0xFF
            for x in range(ch, stride):
                a = r[x - ch]
                up = pv[x]
                c = pv[x - ch]
                p = a + up - c
                pa = p - a if p >= a else a - p
                pb = p - up if p >= up else up - p
                pc = p - c if p >= c else c - p
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = up
                else:
                    pr = c
                r[x] = (r[x] + pr) & 0xFF
            row = np.array(r, np.int64)
        else:
            raise ValueError(f"PNG filter type {f}")
        out[y] = row
        prev = out[y]
    return out.astype(np.uint8).reshape(h, w, ch)


def _decode_png(b: bytes) -> np.ndarray:
    import zlib

    chunks = _png_chunks(b)
    ctype, ihdr = next(chunks)
    if ctype != b"IHDR" or len(ihdr) != 13:
        raise ValueError("PNG missing IHDR")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color, comp, filt, interlace = ihdr[8:13]
    valid_depths = {
        0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
        4: (8, 16), 6: (8, 16),
    }
    if color not in valid_depths or depth not in valid_depths[color]:
        raise ValueError(
            f"malformed PNG: bit depth {depth} invalid for color "
            f"type {color}"
        )
    if comp != 0 or filt != 0 or interlace not in (0, 1) or not w or not h:
        raise ValueError("malformed PNG IHDR")
    if w * h > (1 << 26):  # 67 MP: resource bound for executor tasks
        raise ValueError(
            f"PNG dimensions {w}x{h} exceed the 67-megapixel decoder limit"
        )
    plte = None
    idat_parts = []
    for t, data in chunks:
        if t == b"IDAT":
            idat_parts.append(data)
        elif t == b"PLTE":
            plte = data
    idat = b"".join(idat_parts)
    if not idat:
        raise ValueError("PNG has no IDAT data")
    nch = 1 if color == 3 else _PNG_CHANNELS[color]
    rowbytes = (w * nch * depth + 7) // 8
    if interlace:  # Adam7: 7 concatenated sub-images, each filtered
        passes = []
        for xs, ys, xst, yst in _PNG_ADAM7:
            pw = (w - xs + xst - 1) // xst
            ph = (h - ys + yst - 1) // yst
            if pw > 0 and ph > 0:
                passes.append((xs, ys, xst, yst, pw, ph,
                               (pw * nch * depth + 7) // 8))
        expected = sum(ph * (1 + prb) for *_, ph, prb in passes)
    else:
        expected = h * (1 + rowbytes)
    # bounded inflate: the exact pixel-data size is known from IHDR, so
    # cap the decompressor there instead of trusting the stream - a
    # crafted ~1000:1 deflate bomb would otherwise allocate GBs inside
    # an executor before the length check fired
    try:
        dec = zlib.decompressobj()
        raw = dec.decompress(idat, expected + 1)
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from None
    if len(raw) != expected or dec.unconsumed_tail or (
        not dec.eof and dec.decompress(b"", 1)
    ):
        raise ValueError("PNG pixel data length mismatch")
    def palette_luma(idxs):
        if plte is None or len(plte) % 3 or not len(plte):
            raise ValueError("palette PNG missing a valid PLTE chunk")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        if int(idxs.max()) >= len(pal):
            raise ValueError("PNG palette index out of range")
        return _luma(pal[idxs])

    def reduce_pass(praw, pw, ph, prowbytes):
        """Unfilter + reduce one (sub-)image to (ph, pw) uint8 luma."""
        if depth < 8:  # sub-byte gray or palette indices: filter bpp 1
            rows = _png_unfilter(praw, prowbytes, ph, 1).reshape(
                ph, prowbytes
            )
            bits = np.unpackbits(rows, axis=1)[:, : pw * depth]
            weights = 1 << np.arange(depth - 1, -1, -1)
            vals = (bits.reshape(ph, pw, depth) * weights).sum(axis=2)
            if color == 3:
                return palette_luma(vals)
            # grayscale: scale the sample range to 0..255 (spec 12.5)
            return (vals * (255 // ((1 << depth) - 1))).astype(np.uint8)
        bpp = nch * (depth // 8)
        px = _png_unfilter(praw, pw, ph, bpp)
        if depth == 16:  # big-endian: the high byte IS the 8-bit
            px = px[:, :, ::2]  # reduction (v >> 8), spec sample scaling
        if color == 3:
            return palette_luma(px.reshape(ph, pw))
        if color == 0:
            return px.reshape(ph, pw).copy()
        if color == 4:  # gray + alpha: luminance is the gray channel
            return px[:, :, 0].copy()
        return _luma(px[:, :, :3])  # RGB / RGBA (alpha ignored)

    if interlace:
        out = np.zeros((h, w), np.uint8)
        off = 0
        for xs, ys, xst, yst, pw, ph, prb in passes:
            sz = ph * (1 + prb)
            out[ys::yst, xs::xst] = reduce_pass(
                raw[off:off + sz], pw, ph, prb
            )
            off += sz
        return out
    return reduce_pass(raw, w, h, rowbytes)


# --- GIF (87a/89a, LZW, palette; first frame) ------------------------


def _gif_lzw_decode(mcs: int, data: bytes, max_pixels: int) -> bytearray:
    """Variable-width LSB-first LZW per the GIF spec appendix.  Stops
    after ``max_pixels`` outputs (frames are fixed-size; trailing
    codes are padding) or at the End-Of-Information code."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"bad GIF LZW minimum code size {mcs}")
    clear = 1 << mcs
    eoi = clear + 1
    # dictionary as (prefix_code, suffix_byte); literals are implicit
    prefix = [0] * 4096
    suffix = [0] * 4096
    out = bytearray()
    width = mcs + 1
    next_code = eoi + 1
    prev = -1
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)

    def expand(code):
        stack = bytearray()
        while code >= clear:  # walk the chain down to a literal
            stack.append(suffix[code])
            code = prefix[code]
        stack.append(code)
        stack.reverse()
        return stack

    while len(out) < max_pixels:
        while nbits < width:
            if pos >= n:
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            width = mcs + 1
            next_code = eoi + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:  # first code after clear must be a literal
            if code >= clear:
                raise ValueError("GIF LZW stream starts with a non-literal")
            out.append(code)
            prev = code
            continue
        if code < next_code:
            chunk = expand(code)
        elif code == next_code:  # the KwKwK case
            chunk = expand(prev)
            chunk.append(chunk[0])
        else:
            raise ValueError("GIF LZW code out of range")
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = chunk[0]
            next_code += 1
            # width grows when the NEXT code would not fit (12 max;
            # a full table keeps emitting 12-bit codes until CLEAR)
            if next_code == (1 << width) and width < 12:
                width += 1
        out += chunk
        prev = code
    return out


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _decode_gif(b: bytes) -> np.ndarray:
    """GIF87a/89a decoder (pure stdlib+NumPy): logical screen
    descriptor, global/local color tables, full variable-width LZW,
    4-pass interlacing.  Returns the FIRST frame's luma composed onto
    the logical screen (later frames of an animation are ignored;
    transparency reduces like any other palette entry - decode_image's
    contract is luma, which has no alpha)."""
    n = len(b)
    if n < 13:
        raise ValueError("truncated GIF header")
    sw = int.from_bytes(b[6:8], "little")
    sh = int.from_bytes(b[8:10], "little")
    packed = b[10]
    if not sw or not sh:
        raise ValueError("malformed GIF screen dimensions")
    if sw * sh > (1 << 26):
        raise ValueError(
            f"GIF dimensions {sw}x{sh} exceed the 67-megapixel "
            "decoder limit"
        )
    pos = 13
    gct = None
    if packed & 0x80:
        sz = 3 * (2 << (packed & 7))
        if pos + sz > n:
            raise ValueError("truncated GIF global color table")
        gct = np.frombuffer(b, np.uint8, sz, pos).reshape(-1, 3)
        pos += sz
    bg = b[11]

    def sub_blocks(p):
        parts = []
        while True:
            if p >= n:
                raise ValueError("truncated GIF data sub-blocks")
            ln = b[p]
            p += 1
            if ln == 0:
                return b"".join(parts), p
            if p + ln > n:
                raise ValueError("truncated GIF data sub-blocks")
            parts.append(b[p:p + ln])
            p += ln

    while True:
        if pos >= n:
            raise ValueError("GIF ended without an image or trailer")
        tag = b[pos]
        pos += 1
        if tag == 0x3B:  # trailer before any image
            raise ValueError("GIF contains no image data")
        if tag == 0x21:  # extension: label + sub-blocks, all skippable
            if pos >= n:
                raise ValueError("truncated GIF extension")
            _, pos = sub_blocks(pos + 1)
            continue
        if tag != 0x2C:
            raise ValueError(f"unknown GIF block 0x{tag:02X}")
        # image descriptor
        if pos + 9 > n:
            raise ValueError("truncated GIF image descriptor")
        ix = int.from_bytes(b[pos:pos + 2], "little")
        iy = int.from_bytes(b[pos + 2:pos + 4], "little")
        iw = int.from_bytes(b[pos + 4:pos + 6], "little")
        ih = int.from_bytes(b[pos + 6:pos + 8], "little")
        ipack = b[pos + 8]
        pos += 9
        if not iw or not ih or ix + iw > sw or iy + ih > sh:
            raise ValueError("malformed GIF image descriptor")
        pal = gct
        if ipack & 0x80:  # local color table
            sz = 3 * (2 << (ipack & 7))
            if pos + sz > n:
                raise ValueError("truncated GIF local color table")
            pal = np.frombuffer(b, np.uint8, sz, pos).reshape(-1, 3)
            pos += sz
        if pal is None:
            raise ValueError("GIF image has no color table")
        if pos >= n:
            raise ValueError("truncated GIF image data")
        mcs = b[pos]
        lzw, pos = sub_blocks(pos + 1)
        idx = _gif_lzw_decode(mcs, lzw, iw * ih)
        if len(idx) < iw * ih:
            raise ValueError("GIF LZW stream ended short of the frame")
        arr = np.frombuffer(bytes(idx), np.uint8, iw * ih).reshape(ih, iw)
        if ipack & 0x40:  # interlaced: rows arrive in 4 passes
            rows = np.empty(ih, np.int64)
            r = 0
            for start, step in _GIF_INTERLACE_PASSES:
                cnt = len(range(start, ih, step))
                rows[start:ih:step] = np.arange(r, r + cnt)
                r += cnt
            arr = arr[rows]
        if int(arr.max()) >= len(pal):
            raise ValueError("GIF palette index out of range")
        frame_luma = _luma(pal[arr])
        # compose onto the logical screen (background elsewhere)
        if (ix, iy, iw, ih) == (0, 0, sw, sh):
            return frame_luma
        screen = np.full(
            (sh, sw),
            _luma(pal[bg:bg + 1].reshape(1, 1, 3))[0, 0]
            if bg < len(pal) else 0,
            np.uint8,
        )
        screen[iy:iy + ih, ix:ix + iw] = frame_luma
        return screen


# --- JPEG (ITU-T T.81 baseline sequential DCT, pure NumPy) -----------
#
# Zigzag scan position -> natural (row*8+col) coefficient index.
_JPEG_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], np.int64)


def _jpeg_dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis A: A[k,n] = c_k cos((2n+1)kπ/16)
    with c_0 = sqrt(1/8), c_k = 1/2.  IDCT(C) = Aᵀ·C·A, DCT(x) = A·x·Aᵀ."""
    k = np.arange(8).reshape(8, 1).astype(np.float64)
    n = np.arange(8).reshape(1, 8).astype(np.float64)
    a = 0.5 * np.cos((2 * n + 1) * k * np.pi / 16.0)
    a[0] *= np.sqrt(0.5)
    return a


_JPEG_A = _jpeg_dct_basis()

# Resource bound for executor tasks.  Tighter than PNG's 67 MP cap
# because JPEG entropy decode runs a per-coefficient Python loop
# (~5 s per 0.26 MP of dense content): 4 MP keeps a crafted
# max-dimension payload under ~2 min of task time while covering
# virtually all web imagery (thumbnails through full-size photos).
_JPEG_MAX_PIXELS = 1 << 22


class _JpegBits:
    """MSB-first bit reader over destuffed entropy-coded bytes."""

    __slots__ = ("d", "pos", "acc", "n")

    def __init__(self, d):
        self.d = d
        self.pos = 0
        self.acc = 0
        self.n = 0

    def get(self, nbits: int) -> int:
        while self.n < nbits:
            if self.pos >= len(self.d):
                raise ValueError("truncated JPEG entropy data")
            self.acc = ((self.acc << 8) | self.d[self.pos]) & 0xFFFFFF
            self.pos += 1
            self.n += 8
        self.n -= nbits
        return (self.acc >> self.n) & ((1 << nbits) - 1)


def _jpeg_huff_table(counts, vals):
    """Canonical Huffman decode tables (T.81 F.2.2.3: MINCODE/MAXCODE/
    VALPTR).  ``counts[l-1]`` = number of codes of length l (1..16)."""
    if sum(counts) != len(vals) or sum(
        c << (16 - l) for l, c in enumerate(counts, 1)
    ) > (1 << 16):
        raise ValueError("bad JPEG Huffman table")
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code = 0
    k = 0
    for l in range(1, 17):
        c = counts[l - 1]
        if c:
            valptr[l] = k
            mincode[l] = code
            code += c
            k += c
            maxcode[l] = code - 1
        code <<= 1
    return mincode, maxcode, valptr, list(vals)


def _jpeg_huff_decode(bits: _JpegBits, tbl) -> int:
    mincode, maxcode, valptr, vals = tbl
    code = bits.get(1)
    l = 1
    while code > maxcode[l]:
        l += 1
        if l > 16:
            raise ValueError("invalid JPEG Huffman code")
        code = (code << 1) | bits.get(1)
    return vals[valptr[l] + code - mincode[l]]


def _jpeg_extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map an s-bit magnitude to its signed value."""
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _jpeg_destuff(b: bytes, pos: int):
    """Split the entropy-coded bytes starting at ``pos`` into restart
    segments (0xFF00 unstuffed to 0xFF, RSTn starts a new segment),
    stopping at the first real marker.  Returns (segments, marker_pos)."""
    segs = [bytearray()]
    n = len(b)
    while True:
        j = b.find(0xFF, pos)
        if j < 0:
            segs[-1] += b[pos:]
            return segs, n
        segs[-1] += b[pos:j]
        if j + 1 >= n:
            return segs, n
        m = b[j + 1]
        if m == 0x00:
            segs[-1].append(0xFF)
            pos = j + 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytearray())
            pos = j + 2
        elif m == 0xFF:  # fill byte
            pos = j + 1
        else:
            return segs, j


def _decode_jpeg(b: bytes, default_dht: bool = False) -> np.ndarray:
    """Baseline-sequential JPEG (SOF0/SOF1, Huffman, 8-bit) decoder:
    marker parse, canonical Huffman entropy decode with restart
    markers, dequantize, de-zigzag, float IDCT - pure stdlib+NumPy.
    Returns the luma (Y) plane as (h, w) uint8.  Chroma components are
    entropy-decoded in full (the bit-stream is sequential, so their
    coefficients must be consumed) but not reconstructed:
    ``decode_image``'s contract is Rec.601 luma, which for JFIF YCbCr
    is exactly the Y component.  Progressive (SOF2), arithmetic-coded,
    lossless, hierarchical, and 12-bit streams raise
    ``NotImplementedError``; malformed payloads raise ``ValueError``.

    ``default_dht=True`` pre-loads the T.81 Annex-K typical Huffman
    tables as destinations 0/1 (the MJPEG/OpenDML rule for AVI frames
    that omit DHT); any DHT in the stream still overrides them."""
    n = len(b)
    pos = 2  # past SOI
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], tuple] = {}
    if default_dht:
        for key, (counts, vals) in _JPEG_STD_HUFF.items():
            htabs[key] = _jpeg_huff_table(counts, vals)
    ri = 0  # restart interval (MCUs)
    frame = None
    y_plane = None

    def read_seg(p):
        if p + 2 > n:
            raise ValueError("truncated JPEG segment")
        ln = int.from_bytes(b[p:p + 2], "big")
        if ln < 2 or p + ln > n:
            raise ValueError("truncated JPEG segment")
        return b[p + 2:p + ln], p + ln

    while True:
        if pos + 2 > n:
            raise ValueError("truncated JPEG (no EOI)")
        if b[pos] != 0xFF:
            raise ValueError("JPEG marker misalignment")
        pos += 1
        while pos < n and b[pos] == 0xFF:
            pos += 1
        if pos >= n:
            raise ValueError("truncated JPEG (no EOI)")
        m = b[pos]
        pos += 1
        if m == 0xD9:  # EOI
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:  # TEM / stray RST
            continue
        if m == 0xD8:  # SOI has no length segment; a second one is bogus
            raise ValueError("unexpected JPEG SOI inside stream")
        if m == 0xC4:  # DHT
            seg, pos = read_seg(pos)
            o = 0
            while o < len(seg):
                if o + 17 > len(seg):
                    raise ValueError("truncated JPEG DHT")
                tc, th = seg[o] >> 4, seg[o] & 15
                if tc > 1 or th > 3:
                    raise ValueError("bad JPEG DHT id")
                counts = list(seg[o + 1:o + 17])
                nv = sum(counts)
                if o + 17 + nv > len(seg):
                    raise ValueError("truncated JPEG DHT")
                htabs[(tc, th)] = _jpeg_huff_table(
                    counts, seg[o + 17:o + 17 + nv]
                )
                o += 17 + nv
        elif m == 0xDB:  # DQT
            seg, pos = read_seg(pos)
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 15
                if pq > 1 or tq > 3:
                    raise ValueError("bad JPEG DQT header")
                width = 2 if pq else 1
                if o + 1 + 64 * width > len(seg):
                    raise ValueError("truncated JPEG DQT")
                raw = seg[o + 1:o + 1 + 64 * width]
                qtabs[tq] = (
                    np.frombuffer(raw, ">u2").astype(np.float64)
                    if pq
                    else np.frombuffer(raw, np.uint8).astype(np.float64)
                )
                o += 1 + 64 * width
        elif m == 0xDD:  # DRI
            seg, pos = read_seg(pos)
            if len(seg) < 2:
                raise ValueError("truncated JPEG DRI")
            ri = int.from_bytes(seg[:2], "big")
        elif m in (0xC0, 0xC1, 0xC2):  # baseline / ext. seq. / progressive
            seg, pos = read_seg(pos)
            if len(seg) < 6:
                raise ValueError("truncated JPEG SOF")
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(
                    f"{prec}-bit JPEG: only 8-bit precision decodes here"
                )
            H = int.from_bytes(seg[1:3], "big")
            W = int.from_bytes(seg[3:5], "big")
            nf = seg[5]
            if not H or not W or not nf:
                raise ValueError("malformed JPEG SOF dimensions")
            if W * H > _JPEG_MAX_PIXELS:
                raise ValueError(
                    f"JPEG dimensions {W}x{H} exceed the "
                    f"{_JPEG_MAX_PIXELS >> 20}-megapixel decoder limit"
                )
            if len(seg) < 6 + 3 * nf:
                raise ValueError("truncated JPEG SOF")
            comps = []
            for ci in range(nf):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                ch, cv = hv >> 4, hv & 15
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    raise ValueError("bad JPEG sampling factors")
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            for c in comps:
                if hmax % c["h"] or vmax % c["v"]:
                    raise NotImplementedError(
                        "fractional JPEG chroma sampling ratios"
                    )
                c["w"] = -(-W * c["h"] // hmax)   # ceil comp width
                c["hh"] = -(-H * c["v"] // vmax)  # ceil comp height
                c["wb"] = -(-c["w"] // 8)
                c["hb"] = -(-c["hh"] // 8)
                if m == 0xC2:
                    # progressive: coefficients accumulate across scans
                    # (zigzag order, successive-approximation integers)
                    c["coef"] = np.zeros((c["hb"] * c["wb"], 64), np.int32)
            frame = {"W": W, "H": H, "comps": comps,
                     "hmax": hmax, "vmax": vmax,
                     "progressive": m == 0xC2}
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{m:02X}: only baseline/extended-"
                "sequential Huffman decodes here"
            )
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            seg, pos = read_seg(pos)
            ns = seg[0] if seg else 0
            if not 1 <= ns <= 4 or len(seg) < 1 + 2 * ns + 3:
                raise ValueError("malformed JPEG SOS header")
            prog = frame["progressive"]
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            if prog:
                if ss == 0 and se != 0:
                    raise ValueError("progressive JPEG DC scan with Se != 0")
                if ss > 0 and (ns != 1 or se < ss or se > 63):
                    raise ValueError("malformed progressive JPEG AC scan")
                if ah and ah != al + 1:
                    raise ValueError("bad JPEG successive approximation")
                need_dc = ss == 0 and ah == 0
                need_ac = ss > 0
            else:
                need_dc = need_ac = True
            scomps = []
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                matches = [c for c in frame["comps"] if c["id"] == cs]
                if not matches:
                    raise ValueError("JPEG SOS references unknown component")
                c = matches[0]
                td, ta = tt >> 4, tt & 15
                if (need_dc and (0, td) not in htabs) or (
                    need_ac and (1, ta) not in htabs
                ):
                    raise ValueError("JPEG SOS references missing DHT")
                if c["tq"] not in qtabs:
                    raise ValueError("JPEG SOS references missing DQT")
                scomps.append(
                    {**c, "dc": htabs.get((0, td)), "ac": htabs.get((1, ta)),
                     "q": qtabs[c["tq"]], "pred": 0}
                )
            segs, pos = _jpeg_destuff(b, pos)
            if prog:
                _jpeg_decode_scan_progressive(
                    frame, scomps, segs, ri, ss, se, ah, al
                )
                frame["scanned"] = True
            else:
                y_new = _jpeg_decode_scan(frame, scomps, segs, ri)
                if y_new is not None:
                    y_plane = y_new
        else:  # APPn / COM / DNL / anything skippable
            _, pos = read_seg(pos)

    if frame is not None and frame.get("progressive"):
        luma = frame["comps"][0]
        if not frame.get("scanned"):
            raise ValueError("progressive JPEG contains no scan")
        if luma["tq"] not in qtabs:
            raise ValueError("progressive JPEG missing luma DQT")
        coef = luma["coef"].astype(np.float64) * qtabs[luma["tq"]]
        nat = np.zeros_like(coef)
        nat[:, _JPEG_ZZ] = coef  # de-zigzag
        return _jpeg_y_image(frame, luma, nat)
    if y_plane is None:
        raise ValueError("JPEG contains no luma scan")
    return y_plane


def _jpeg_decode_scan(frame, scomps, segs, ri):
    """Entropy-decode one scan (interleaved if Ns>1, else single-
    component per T.81 A.2).  Returns the reconstructed full-resolution
    Y plane if the scan contains the frame's first (luma) component,
    else None (chroma coefficients are consumed and discarded)."""
    luma = frame["comps"][0]
    interleaved = len(scomps) > 1
    if interleaved:
        mcus_x = -(-frame["W"] // (8 * frame["hmax"]))
        mcus_y = -(-frame["H"] // (8 * frame["vmax"]))
    else:
        c = scomps[0]
        mcus_x, mcus_y = c["wb"], c["hb"]
    total_mcus = mcus_x * mcus_y

    y_store = None
    for c in scomps:
        if c["id"] == luma["id"]:
            y_store = np.zeros((c["hb"] * c["wb"], 64), np.float64)
            c["store"] = y_store
        else:
            c["store"] = None

    zz = _JPEG_ZZ
    seg_i = 0
    bits = _JpegBits(segs[0])
    for mcu in range(total_mcus):
        if ri and mcu and mcu % ri == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("missing JPEG restart marker")
            bits = _JpegBits(segs[seg_i])
            for c in scomps:
                c["pred"] = 0
        mx, my = mcu % mcus_x, mcu // mcus_x
        for c in scomps:
            nh, nv = (c["h"], c["v"]) if interleaved else (1, 1)
            for by in range(nv):
                for bx in range(nh):
                    if interleaved:
                        bcol = mx * nh + bx
                        brow = my * nv + by
                    else:
                        bcol, brow = mx, my
                    store = c["store"]
                    vec = None
                    if store is not None and bcol < c["wb"] and brow < c["hb"]:
                        vec = store[brow * c["wb"] + bcol]
                    q = c["q"]  # DQT tables are zigzag-ordered, like k
                    t = _jpeg_huff_decode(bits, c["dc"])
                    if t > 15:
                        raise ValueError("bad JPEG DC category")
                    diff = _jpeg_extend(bits.get(t), t) if t else 0
                    c["pred"] += diff
                    if vec is not None:
                        vec[0] = c["pred"] * q[0]
                    k = 1
                    while k < 64:
                        rs = _jpeg_huff_decode(bits, c["ac"])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        v = _jpeg_extend(bits.get(s), s)
                        if vec is not None:
                            vec[zz[k]] = v * q[k]
                        k += 1

    if y_store is None:
        return None
    c = next(c for c in scomps if c["store"] is not None)
    return _jpeg_y_image(frame, c, y_store)


def _jpeg_y_image(frame, c, store) -> np.ndarray:
    """Vectorized IDCT + crop/replicate of a component's dequantized
    NATURAL-order coefficient array into the full-resolution plane."""
    blocks = store.reshape(-1, 8, 8)
    spatial = _JPEG_A.T @ blocks @ _JPEG_A
    hb, wb = c["hb"], c["wb"]
    img = spatial.reshape(hb, wb, 8, 8).transpose(0, 2, 1, 3).reshape(
        hb * 8, wb * 8
    )
    img = np.clip(np.round(img) + 128.0, 0, 255).astype(np.uint8)
    img = img[:c["hh"], :c["w"]]
    rh, rw = frame["vmax"] // c["v"], frame["hmax"] // c["h"]
    if rh > 1 or rw > 1:  # subsampled luma (legal, rare): replicate
        img = np.repeat(np.repeat(img, rh, 0), rw, 1)
    return np.ascontiguousarray(img[:frame["H"], :frame["W"]])


def _jpeg_decode_scan_progressive(frame, scomps, segs, ri, ss, se, ah, al):
    """One progressive scan (T.81 G.2): DC first/refine (interleaved
    allowed), AC first/refine (single component) with EOB-run
    semantics.  Coefficients accumulate into each component's
    ``coef`` array (zigzag order, quantized successive-approximation
    integers); reconstruction happens once at EOI."""
    interleaved = len(scomps) > 1
    if interleaved:
        mcus_x = -(-frame["W"] // (8 * frame["hmax"]))
        mcus_y = -(-frame["H"] // (8 * frame["vmax"]))
    else:
        mcus_x, mcus_y = scomps[0]["wb"], scomps[0]["hb"]
    total_mcus = mcus_x * mcus_y
    scratch = np.zeros(64, np.int32)  # interleaved padding blocks
    p1, m1 = 1 << al, -1 << al

    eobrun = 0
    seg_i = 0
    bits = _JpegBits(segs[0])
    for mcu in range(total_mcus):
        if ri and mcu and mcu % ri == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("missing JPEG restart marker")
            bits = _JpegBits(segs[seg_i])
            eobrun = 0
            for c in scomps:
                c["pred"] = 0
        mx, my = mcu % mcus_x, mcu // mcus_x
        for c in scomps:
            nh, nv = (c["h"], c["v"]) if interleaved else (1, 1)
            for by in range(nv):
                for bx in range(nh):
                    if interleaved:
                        bcol = mx * nh + bx
                        brow = my * nv + by
                    else:
                        bcol, brow = mx, my
                    if bcol < c["wb"] and brow < c["hb"]:
                        coef = c["coef"][brow * c["wb"] + bcol]
                    else:
                        coef = scratch  # decoded but discarded
                    if ss == 0 and ah == 0:  # DC first
                        t = _jpeg_huff_decode(bits, c["dc"])
                        if t > 15:
                            raise ValueError("bad JPEG DC category")
                        diff = _jpeg_extend(bits.get(t), t) if t else 0
                        c["pred"] += diff
                        coef[0] = c["pred"] << al
                    elif ss == 0:  # DC refine: one raw bit per block
                        if bits.get(1):
                            coef[0] |= p1
                    elif ah == 0:  # AC first
                        if eobrun:
                            eobrun -= 1
                            continue
                        k = ss
                        while k <= se:
                            rs = _jpeg_huff_decode(bits, c["ac"])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r != 15:
                                    eobrun = (1 << r) - 1
                                    if r:
                                        eobrun += bits.get(r)
                                    break
                                k += 16  # ZRL
                            else:
                                k += r
                                if k > se:
                                    raise ValueError(
                                        "JPEG AC run past band end"
                                    )
                                coef[k] = _jpeg_extend(
                                    bits.get(s), s
                                ) << al
                                k += 1
                    else:  # AC refine (T.81 G.2.3 / jdphuff semantics)
                        k = ss
                        if eobrun == 0:
                            while k <= se:
                                rs = _jpeg_huff_decode(bits, c["ac"])
                                r, s = rs >> 4, rs & 15
                                val = 0
                                if s == 0:
                                    if r != 15:
                                        eobrun = 1 << r
                                        if r:
                                            eobrun += bits.get(r)
                                        break
                                    # r == 15: pass 16 zero-history
                                    # coefficients (corrections still
                                    # read for nonzeros on the way)
                                else:
                                    if s != 1:
                                        raise ValueError(
                                            "bad JPEG AC refinement size"
                                        )
                                    val = p1 if bits.get(1) else m1
                                while k <= se:
                                    cv = coef[k]
                                    if cv:
                                        if bits.get(1) and not (cv & p1):
                                            coef[k] = cv + (
                                                p1 if cv >= 0 else m1
                                            )
                                    else:
                                        if r == 0:
                                            break
                                        r -= 1
                                    k += 1
                                if val and k <= se:
                                    coef[k] = val
                                k += 1
                        if eobrun > 0:
                            while k <= se:
                                cv = coef[k]
                                if cv and bits.get(1) and not (cv & p1):
                                    coef[k] = cv + (p1 if cv >= 0 else m1)
                                k += 1
                            eobrun -= 1


def _packbits_decode(src: bytes, expect: int) -> bytes:
    """TIFF PackBits RLE (Apple spec, TIFF 6.0 §9): n in 0..127 copies
    n+1 literal bytes, n in -127..-1 repeats the next byte 1-n times,
    -128 is a no-op.  Output is clamped at ``expect`` bytes."""
    out = bytearray()
    i = 0
    ln = len(src)
    while i < ln and len(out) < expect:
        n = src[i] - 256 if src[i] > 127 else src[i]
        i += 1
        if n == -128:
            continue
        if n >= 0:
            if i + n + 1 > ln:
                raise ValueError("truncated TIFF PackBits literal run")
            out += src[i:i + n + 1]
            i += n + 1
        else:
            if i >= ln:
                raise ValueError("truncated TIFF PackBits repeat run")
            out += bytes([src[i]]) * (1 - n)
            i += 1
    if len(out) < expect:
        raise ValueError("TIFF PackBits strip shorter than declared")
    return bytes(out[:expect])


def _tiff_lzw_decode(src: bytes, expect: int) -> bytes:
    """TIFF LZW (TIFF 6.0 §13): MSB-first bit packing, 9->12-bit
    codes, ClearCode 256 / EOI 257, and the spec's EARLY CHANGE (the
    code width bumps one code sooner than the table size strictly
    requires - libtiff-compatible).  Distinct from GIF's LZW, which
    packs LSB-first with a variable minimum code size."""
    out = bytearray()
    acc = nbits = 0
    pos = 0
    ln = len(src)
    table: list[bytes] = []
    width = 9
    prev = b""

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = b""

    reset()
    while len(out) < expect:
        while nbits < width:
            if pos >= ln:
                raise ValueError("truncated TIFF LZW stream")
            acc = (acc << 8) | src[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        if code == 256:
            reset()
            continue
        if code == 257:
            break
        if not prev:
            if code > 255:
                raise ValueError("bad first TIFF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF LZW code beyond table")
        out += entry
        prev = entry
        # early change: widen when the NEXT append would reach 2^w - 1
        if len(table) >= (1 << width) - 1 and width < 12:
            width += 1
    if len(out) < expect:
        raise ValueError("TIFF LZW strip shorter than declared")
    return bytes(out[:expect])


def _decode_tiff(b: bytes) -> np.ndarray:
    """Baseline TIFF (6.0): both byte orders (II/MM), first IFD,
    8-bit grayscale (photometric 0/1) or chunky RGB(A), strips,
    compression none (1), LZW (5), deflate (8/32946), or PackBits
    (32773) - LZW and deflate incl. the horizontal-differencing
    predictor.  Tiled, planar, palette, JPEG-compressed, and
    non-8-bit variants raise
    ``NotImplementedError``; malformed structures raise
    ``ValueError``.  Returns (h, w) uint8 luma like the other
    decoders.  Cross-checked against real libtiff in tests (helper
    compiled on demand against the system libtiff.so)."""
    bo = "little" if b[:2] == b"II" else "big"

    def u(lo, n):
        if lo + n > len(b):
            raise ValueError("truncated TIFF structure")
        return int.from_bytes(b[lo:lo + n], bo)

    ifd = u(4, 4)
    n_entries = u(ifd, 2)
    if n_entries == 0:
        raise ValueError("empty TIFF IFD")
    _SZ = {1: 1, 2: 1, 3: 2, 4: 4}
    tags: dict[int, list[int]] = {}
    for e in range(n_entries):
        lo = ifd + 2 + 12 * e
        tag, typ, cnt = u(lo, 2), u(lo + 2, 2), u(lo + 4, 4)
        if typ not in _SZ:  # RATIONAL etc.: not needed for decode
            continue
        w_ = _SZ[typ]
        total = w_ * cnt
        vlo = lo + 8 if total <= 4 else u(lo + 8, 4)
        if vlo + total > len(b):
            raise ValueError("TIFF tag value out of bounds")
        tags[tag] = [u(vlo + i * w_, w_) for i in range(cnt)]

    def one(tag, default=None):
        v = tags.get(tag)
        if v is not None and not v:  # present but count=0: malformed
            raise ValueError(f"TIFF tag {tag} has count 0")
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    if not w or not h:
        raise ValueError("malformed TIFF dimensions")
    if w * h > (1 << 26):
        raise ValueError(
            f"TIFF dimensions {w}x{h} exceed the 67-megapixel decoder limit"
        )
    comp = one(259, 1)
    photo = one(262)
    spp = one(277, 1)
    bits = tags.get(258, [1])
    if not bits:
        raise ValueError("TIFF BitsPerSample has count 0")
    rows_per_strip = one(278, h)
    if not 1 <= spp <= 8:
        raise ValueError(f"TIFF SamplesPerPixel {spp} out of range")
    if w * h * spp > (1 << 27):
        # the PIXEL cap alone is bypassable via a huge SamplesPerPixel:
        # bound the decoded BYTES too (strips are decoded eagerly)
        raise ValueError(
            f"TIFF decoded size {w}x{h}x{spp} exceeds the 128 MiB bound"
        )
    planar = one(284, 1)
    predictor = one(317, 1)
    if comp not in (1, 5, 8, 32773, 32946):
        raise NotImplementedError(
            f"TIFF compression {comp}: only uncompressed, LZW, "
            "deflate, and PackBits decode without codec libraries"
        )
    if predictor not in (1, 2) or (predictor == 2 and comp not in (5, 8, 32946)):
        raise NotImplementedError(
            f"TIFF predictor {predictor} with compression {comp} "
            "not supported"
        )
    if planar != 1:
        raise NotImplementedError("planar TIFF not supported")
    if photo not in (0, 1, 2):
        raise NotImplementedError(
            f"TIFF photometric {photo}: only gray/RGB decode here"
        )
    if any(x != 8 for x in bits) or (photo == 2 and spp < 3) or (
        photo != 2 and spp != 1
    ):
        raise NotImplementedError(
            "only 8-bit gray and 8-bit chunky RGB(A) TIFF decode here"
        )
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF strip offsets/byte-counts missing or unequal")
    row_bytes = w * spp
    raw = bytearray()
    remaining = h
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(b):
            raise ValueError("TIFF strip out of bounds")
        strip_rows = min(rows_per_strip, remaining)
        expect = strip_rows * row_bytes
        chunk = b[off:off + cnt]
        if comp == 32773:
            raw += _packbits_decode(chunk, expect)
        elif comp == 5:
            raw += _tiff_lzw_decode(chunk, expect)
        elif comp in (8, 32946):  # deflate (Adobe + old-style tags)
            import zlib

            try:
                # bounded: a strip must not inflate past its rows
                d = zlib.decompressobj().decompress(chunk, expect)
            except zlib.error as ex:
                raise ValueError(f"bad TIFF deflate strip: {ex}") from ex
            if len(d) < expect:
                raise ValueError("TIFF deflate strip shorter than declared")
            raw += d
        else:
            if cnt < expect:
                raise ValueError("truncated TIFF strip")
            raw += chunk[:expect]
        remaining -= strip_rows
    if remaining > 0:
        raise ValueError("TIFF strips cover fewer rows than ImageLength")
    px = np.frombuffer(bytes(raw), np.uint8, h * row_bytes).reshape(
        h, w, spp
    )
    if predictor == 2:
        # horizontal differencing: each sample stores the delta from
        # the same sample one pixel to the left; undo with a cumsum
        px = np.cumsum(px.astype(np.uint32), axis=1).astype(np.uint8)
    if photo == 2:
        return _luma(px[..., :3])
    gray = px[..., 0]
    return (255 - gray) if photo == 0 else gray.copy()


class _Vp8lBits:
    """LSB-first bit reader for the VP8L lossless bitstream."""

    def __init__(self, d: bytes):
        self.d = d
        self.pos = 0  # bit position

    def bits(self, n: int) -> int:
        p = self.pos
        end = p + n
        if end > 8 * len(self.d):
            raise ValueError("truncated VP8L bitstream")
        v = 0
        shift = 0
        while p < end:
            byte = self.d[p >> 3]
            take = min(8 - (p & 7), end - p)
            v |= ((byte >> (p & 7)) & ((1 << take) - 1)) << shift
            shift += take
            p += take
        self.pos = end
        return v


class _Vp8lHuff:
    """Canonical (deflate-style) Huffman decoder; codes are read one
    bit at a time MSB-first off the LSB-first bitstream.  A code with
    a single used symbol costs zero bits (libwebp semantics)."""

    def __init__(self, lengths):
        used = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ValueError("empty VP8L huffman code")
        if len(used) == 1:
            self.single = used[0][1]
            return
        self.single = None
        bl_count: dict[int, int] = {}
        for ln, _ in used:
            bl_count[ln] = bl_count.get(ln, 0) + 1
        max_len = max(bl_count)
        kraft = sum(n << (max_len - ln) for ln, n in bl_count.items())
        if kraft != 1 << max_len:
            # over-subscribed codes would silently collide in the
            # table; under-subscribed ones leave unmapped bit paths -
            # the spec requires complete codes (libwebp rejects both)
            raise ValueError("incomplete/over-subscribed VP8L huffman code")
        code = 0
        next_code = {}
        for ln in range(1, max(bl_count) + 1):
            code = (code + bl_count.get(ln - 1, 0)) << 1
            next_code[ln] = code
        table = {}
        for ln, sym in sorted(used):
            table[(ln, next_code[ln])] = sym
            next_code[ln] += 1
        self.table = table
        self.max_len = max(bl_count)

    def read(self, br: _Vp8lBits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.bits(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L huffman code")


_VP8L_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11,
                  12, 13, 14, 15]


def _vp8l_read_code(br: _Vp8lBits, alphabet_size: int) -> _Vp8lHuff:
    """One Huffman code: 'simple' (1-2 symbols inline) or code-length
    coded (spec 5.2.2, deflate-style 16/17/18 repeats)."""
    if br.bits(1):  # simple
        num_symbols = br.bits(1) + 1
        if br.bits(1):
            sym0 = br.bits(8)
        else:
            sym0 = br.bits(1)
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size:
            raise ValueError("VP8L simple code symbol out of range")
        lengths[sym0] = 1
        if num_symbols == 2:
            sym1 = br.bits(8)
            if sym1 >= alphabet_size:
                raise ValueError("VP8L simple code symbol out of range")
            lengths[sym1] = 1
        return _Vp8lHuff(lengths)
    num_codes = 4 + br.bits(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_VP8L_CL_ORDER[i]] = br.bits(3)
    cl = _Vp8lHuff(cl_lengths)
    if br.bits(1):  # length-limited stream
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = cl.read(br)
        if s < 16:
            lengths[symbol] = s
            symbol += 1
            if s:
                prev = s
        else:
            if s == 16:
                repeat, val = 3 + br.bits(2), prev
            elif s == 17:
                repeat, val = 3 + br.bits(3), 0
            else:
                repeat, val = 11 + br.bits(7), 0
            if symbol + repeat > alphabet_size:
                raise ValueError("VP8L code-length repeat overflow")
            for _ in range(repeat):
                lengths[symbol] = val
                symbol += 1
    return _Vp8lHuff(lengths)


def _vp8l_prefix_value(br: _Vp8lBits, prefix: int) -> int:
    """LZ77 length/distance prefix decoding (spec 4.2.2)."""
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.bits(extra) + 1


# 2D distance neighborhood (spec 4.2.2): the 120 closest (dx, dy)
# offsets with dy 0..7, dx -7..8 (dy=0 restricted to dx>=1), ordered
# by squared euclidean distance, then deeper rows first, then
# positive dx before negative.  Validated against libwebp-encoded
# streams in tests (wrong entries produce pixel mismatches on the
# pattern-rich cross-check images).
_VP8L_DIST_MAP = sorted(
    [(dx, 0) for dx in range(1, 9)]
    + [(dx, dy) for dy in range(1, 8) for dx in range(-7, 9)],
    key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], p[0] < 0),
)


def _vp8l_meta(br: _Vp8lBits, w: int, h: int, top: bool):
    """Entropy-coded image prelude: optional color cache, optional
    meta-huffman (only at top level), then the huffman groups."""
    cache_bits = 0
    if br.bits(1):
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad VP8L color-cache size")
    entropy = None
    huff_bits = 0
    num_groups = 1
    if top and br.bits(1):
        huff_bits = br.bits(3) + 2
        ew = -(-w // (1 << huff_bits))
        eh = -(-h // (1 << huff_bits))
        entropy = _vp8l_decode_pixels(br, ew, eh, top=False)
        idx = ((entropy >> 8) & 0xFFFF).astype(np.int64)
        entropy = idx.reshape(eh, ew)
        num_groups = int(entropy.max()) + 1
    groups = []
    green_size = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    for _ in range(num_groups):
        groups.append((
            _vp8l_read_code(br, green_size),
            _vp8l_read_code(br, 256),   # red
            _vp8l_read_code(br, 256),   # blue
            _vp8l_read_code(br, 256),   # alpha
            _vp8l_read_code(br, 40),    # distance
        ))
    return cache_bits, entropy, huff_bits, groups


def _vp8l_decode_pixels(
    br: _Vp8lBits, w: int, h: int, top: bool
) -> np.ndarray:
    """Decode one entropy-coded ARGB image (uint32 array of h*w) -
    used for the main image, transform parameter images, the entropy
    image, and palettes."""
    cache_bits, entropy, huff_bits, groups = _vp8l_meta(br, w, h, top)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    n = w * h
    out = np.zeros(n, np.uint32)
    pos = 0
    g = groups[0]
    while pos < n:
        if entropy is not None:
            x, y = pos % w, pos // w
            g = groups[entropy[y >> huff_bits, x >> huff_bits]]
        s = g[0].read(br)
        if s < 256:
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            if cache is not None:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
        elif s < 256 + 24:
            length = _vp8l_prefix_value(br, s - 256)
            dist_code = _vp8l_prefix_value(br, g[4].read(br))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _VP8L_DIST_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("VP8L backward reference out of range")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                if cache is not None:
                    cache[
                        (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = px
                pos += 1
        else:
            out[pos] = cache[s - 256 - 24]
            pos += 1
    return out


def _vp8l_avg2(a, b):
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _vp8l_read_transform(br: _Vp8lBits, w: int, h: int):
    ttype = br.bits(2)
    if ttype == 0:  # PREDICTOR
        size_bits = br.bits(3) + 2
        bw = -(-w // (1 << size_bits))
        bh = -(-h // (1 << size_bits))
        img = _vp8l_decode_pixels(br, bw, bh, top=False)
        return ("predictor", size_bits, img.reshape(bh, bw)), w
    if ttype == 1:  # COLOR (cross-color)
        size_bits = br.bits(3) + 2
        bw = -(-w // (1 << size_bits))
        bh = -(-h // (1 << size_bits))
        img = _vp8l_decode_pixels(br, bw, bh, top=False)
        return ("color", size_bits, img.reshape(bh, bw)), w
    if ttype == 2:  # SUBTRACT_GREEN
        return ("subtract_green",), w
    # COLOR_INDEXING (palette)
    n_colors = br.bits(8) + 1
    pal = _vp8l_decode_pixels(br, n_colors, 1, top=False)
    # palette entries are component-wise delta-coded
    acc = 0
    palette = []
    for p in pal:
        a = ((acc >> 24) + (int(p) >> 24)) & 0xFF
        r = (((acc >> 16) & 0xFF) + ((int(p) >> 16) & 0xFF)) & 0xFF
        gg = (((acc >> 8) & 0xFF) + ((int(p) >> 8) & 0xFF)) & 0xFF
        bb = ((acc & 0xFF) + (int(p) & 0xFF)) & 0xFF
        acc = (a << 24) | (r << 16) | (gg << 8) | bb
        palette.append(acc)
    if n_colors <= 2:
        wbits = 3
    elif n_colors <= 4:
        wbits = 2
    elif n_colors <= 16:
        wbits = 1
    else:
        wbits = 0
    new_w = -(-w // (1 << wbits)) if wbits else w
    # w is carried so the inverse can clamp the bundle padding back
    # to the pre-transform width
    return ("palette", wbits, palette, w), new_w


def _vp8l_apply_inverse(t, argb: np.ndarray, w: int, h: int):
    """Apply one inverse transform; returns (argb, w) - palette
    unbundling restores the full width."""
    kind = t[0]
    if kind == "subtract_green":
        g = (argb >> 8) & 0xFF
        r = (((argb >> 16) & 0xFF) + g) & 0xFF
        b = ((argb & 0xFF) + g) & 0xFF
        return (argb & np.uint32(0xFF00FF00)) | (r << 16) | b, w
    if kind == "palette":
        _, wbits, palette, orig_w = t
        pal = np.array(
            palette + [0] * (256 - len(palette)), np.uint32
        )
        if wbits == 0:
            idx = (argb >> 8) & 0xFF
            return pal[idx], orig_w
        px_per = 1 << wbits
        ibits = 8 >> wbits
        packed = ((argb >> 8) & 0xFF).reshape(h, -1)
        full_w = packed.shape[1] * px_per
        idx = np.zeros((h, full_w), np.uint32)
        for k in range(px_per):
            idx[:, k::px_per] = (packed >> (k * ibits)) & ((1 << ibits) - 1)
        idx = idx[:, :orig_w]  # drop the final byte's bundle padding
        return pal[idx].reshape(-1), orig_w
    if kind == "color":
        # no sequential dependency (unlike the predictor): expand the
        # per-tile multipliers and invert every pixel vectorized
        _, size_bits, img = t
        px = argb.reshape(h, w)
        bs = 1 << size_bits
        cte = np.repeat(np.repeat(img, bs, 0), bs, 1)[:h, :w].astype(
            np.int64
        )
        g2r = (cte & 0xFF).astype(np.int8).astype(np.int32)
        g2b = ((cte >> 8) & 0xFF).astype(np.int8).astype(np.int32)
        r2b = ((cte >> 16) & 0xFF).astype(np.int8).astype(np.int32)
        sg = ((px >> 8) & 0xFF).astype(np.int8).astype(np.int32)
        red = (
            (((px >> 16) & 0xFF).astype(np.int32) + ((g2r * sg) >> 5))
            & 0xFF
        )
        sr = red.astype(np.uint8).astype(np.int8).astype(np.int32)
        blue = (
            ((px & 0xFF).astype(np.int32) + ((g2b * sg) >> 5)
             + ((r2b * sr) >> 5)) & 0xFF
        )
        out = (
            (px & np.uint32(0xFF00FF00))
            | (red.astype(np.uint32) << 16)
            | blue.astype(np.uint32)
        )
        return out.reshape(-1), w
    # predictor
    _, size_bits, img = t
    px = argb.reshape(h, w).astype(np.int64)
    out = np.zeros((h, w), np.int64)
    for y in range(h):
        mrow = img[y >> size_bits]
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[0, x - 1])  # left
            elif x == 0:
                pred = int(out[y - 1, 0])  # top
            else:
                mode = (int(mrow[x >> size_bits]) >> 8) & 0xFF
                L = int(out[y, x - 1])
                T = int(out[y - 1, x])
                # last column: rows are contiguous in the reference
                # implementation, so "top-right" wraps to the FIRST
                # pixel of the CURRENT row - canonical behavior
                TR = int(out[y - 1, x + 1]) if x + 1 < w else int(
                    out[y, 0]
                )
                TL = int(out[y - 1, x - 1])
                pred = _vp8l_predict(mode, L, T, TR, TL)
            v = int(px[y, x])
            out[y, x] = _vp8l_addpix(v, pred)
    return out.reshape(-1).astype(np.uint32), w


def _vp8l_addpix(a: int, b: int) -> int:
    s = 0
    for shift in (0, 8, 16, 24):
        s |= (((a >> shift) + (b >> shift)) & 0xFF) << shift
    return s


def _vp8l_clamp_add_sub_full(L, T, TL):
    s = 0
    for shift in (0, 8, 16, 24):
        c = ((L >> shift) & 0xFF) + ((T >> shift) & 0xFF) - (
            (TL >> shift) & 0xFF
        )
        s |= max(0, min(255, c)) << shift
    return s


def _vp8l_clamp_add_sub_half(ave, TL):
    s = 0
    for shift in (0, 8, 16, 24):
        a = (ave >> shift) & 0xFF
        b = (TL >> shift) & 0xFF
        # reference formula a + (a - b) / 2 with C truncation
        # toward zero
        half = (a - b) // 2 if a >= b else -((b - a) // 2)
        s |= max(0, min(255, a + half)) << shift
    return s


def _vp8l_predict(mode, L, T, TR, TL):
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _vp8l_avg2(_vp8l_avg2(L, TR), T)
    if mode == 6:
        return _vp8l_avg2(L, TL)
    if mode == 7:
        return _vp8l_avg2(L, T)
    if mode == 8:
        return _vp8l_avg2(TL, T)
    if mode == 9:
        return _vp8l_avg2(T, TR)
    if mode == 10:
        return _vp8l_avg2(_vp8l_avg2(L, TL), _vp8l_avg2(T, TR))
    if mode == 11:  # Select: smaller summed channel gradient wins,
        # T on ties (reference Sub3/Select semantics)
        diff = 0
        for shift in (0, 8, 16, 24):
            tl = (TL >> shift) & 0xFF
            diff += abs(((L >> shift) & 0xFF) - tl) - abs(
                ((T >> shift) & 0xFF) - tl
            )
        return T if diff <= 0 else L
    if mode == 12:
        return _vp8l_clamp_add_sub_full(L, T, TL)
    if mode == 13:
        return _vp8l_clamp_add_sub_half(_vp8l_avg2(L, T), TL)
    raise ValueError(f"bad VP8L predictor mode {mode}")


def _decode_webp(b: bytes) -> np.ndarray:
    """Lossless WebP (VP8L): RIFF walk to the VP8L chunk, full
    bitstream decode - meta-huffman groups, color cache, LZ77 over
    the 2D distance map, and all four inverse transforms (predictor,
    cross-color, subtract-green, palette incl. sub-byte bundling).
    Returns (h, w) uint8 luma.  Lossy 'VP8 ' and animations raise
    ``NotImplementedError``.  Cross-checked pixel-exact against real
    libwebp in tests."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise NotImplementedError("not a WebP container")
    i = 12
    payload = None
    while i + 8 <= len(b):
        fourcc = b[i:i + 4]
        size = int.from_bytes(b[i + 4:i + 8], "little")
        if fourcc == b"VP8L":
            payload = b[i + 8:i + 8 + size]
            break
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "lossy WebP (VP8) needs a full DCT codec; only "
                "lossless VP8L decodes here"
            )
        if fourcc in (b"ANIM", b"ANMF"):
            raise NotImplementedError(
                "animated WebP not supported (frames live inside "
                "ANMF chunks)"
            )
        i += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("WebP container without VP8L chunk")
    if not payload or payload[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _Vp8lBits(payload[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bits(1)  # alpha hint
    if br.bits(3) != 0:
        raise ValueError("unknown VP8L version")
    if w * h > _JPEG_MAX_PIXELS:
        # per-pixel pure-Python decode: same throughput class as the
        # JPEG path, so it shares the tighter 4 MP executor bound
        raise ValueError(
            f"WebP dimensions {w}x{h} exceed the "
            f"{_JPEG_MAX_PIXELS >> 20}-megapixel decoder limit"
        )
    transforms = []
    cur_w = w
    while br.bits(1):
        t, cur_w = _vp8l_read_transform(br, cur_w, h)
        transforms.append(t)
    argb = _vp8l_decode_pixels(br, cur_w, h, top=True)
    for t in reversed(transforms):
        argb, cur_w = _vp8l_apply_inverse(t, argb, cur_w, h)
    px = argb.reshape(h, w)
    rgb = np.stack(
        [(px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF], axis=-1
    ).astype(np.uint8)
    return _luma(rgb)


def decode_image(payload: bytes) -> np.ndarray:
    """REAL image decode for the containers a pure stdlib+NumPy
    reader can handle: PPM (P6), PGM (P5), BMP (BITMAPINFOHEADER,
    uncompressed, 8-bit palette or 24-bit BGR), PNG (every legal
    depth/color combination: gray 1/2/4/8/16, palette 1/2/4/8 via
    PLTE, gray+alpha/RGB/RGBA 8/16; interlace method 0 or Adam7 -
    stdlib zlib inflate + the five spec filters), GIF87a/89a (full
    variable-width LZW incl. the KwKwK case and deferred clears,
    global/local palettes, 4-pass interlacing; FIRST frame of an
    animation), and Huffman JPEG - baseline (SOF0/SOF1) and
    progressive (SOF2: DC/AC first + successive-approximation
    refinement scans, EOB runs) - 8-bit, any 1-4x sampling, restart
    markers: full T.81 entropy decode + float IDCT; the returned
    luma IS the Y plane - baseline TIFF (II/MM byte orders,
    8-bit gray/RGB(A) strips; uncompressed, LZW, deflate - both with
    the horizontal predictor - or PackBits) - and lossless WebP
    (full VP8L: meta-huffman, color cache, LZ77, all four inverse
    transforms).  Returns a
    (h, w) uint8 grayscale array (color reduces via Rec.601 luma;
    16-bit samples reduce to their high byte).  Any other CONTAINER
    - arithmetic-coded JPEG, BITMAPCOREHEADER BMP, tiled TIFF,
    lossy VP8 WebP - raises ``NotImplementedError`` (those need codec
    libraries this container does not ship); a truncated or
    malformed payload of a supported container raises
    ``ValueError``."""
    b = bytes(payload)
    if b[:8] == _PNG_SIG:
        return _decode_png(b)
    if b[:2] == b"\xff\xd8":
        return _decode_jpeg(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(b)
    if b[:4] in (b"II*\x00", b"MM\x00*"):
        return _decode_tiff(b)
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        return _decode_webp(b)

    def body(off, need):
        if len(b) - off < need:
            raise ValueError("truncated image payload")
        return np.frombuffer(b, np.uint8, need, off)

    if b[:2] == b"P5":
        (w, h, _maxval), off = _pnm_header(b, 3)
        return body(off, w * h).reshape(h, w).copy()
    if b[:2] == b"P6":
        (w, h, _maxval), off = _pnm_header(b, 3)
        return _luma(body(off, w * h * 3).reshape(h, w, 3))
    if b[:2] == b"BM":
        if len(b) < 18:
            raise ValueError("truncated BMP header")
        data_off = int.from_bytes(b[10:14], "little")
        hdr_size = int.from_bytes(b[14:18], "little")
        if hdr_size < 40:
            # BITMAPCOREHEADER (OS/2) lays its fields out differently;
            # parsing it at INFOHEADER offsets would yield garbage dims
            raise NotImplementedError(
                f"BMP header size {hdr_size}: only BITMAPINFOHEADER "
                "(>=40) decodes here"
            )
        if len(b) < 54:
            raise ValueError("truncated BMP header")
        w = int.from_bytes(b[18:22], "little", signed=True)
        h = int.from_bytes(b[22:26], "little", signed=True)
        bpp = int.from_bytes(b[28:30], "little")
        comp = int.from_bytes(b[30:34], "little")
        if comp != 0 or bpp not in (8, 24):
            raise NotImplementedError(
                f"BMP bpp={bpp} compression={comp}: only uncompressed "
                "8/24-bit BMP decodes here"
            )
        bottom_up = h > 0
        h = abs(h)
        stride = ((bpp * w + 31) // 32) * 4
        rows = body(data_off, stride * h).reshape(h, stride)
        if bottom_up:
            rows = rows[::-1]
        if bpp == 8:
            n_colors = int.from_bytes(b[46:50], "little") or 256
            pal = body(14 + hdr_size, n_colors * 4).reshape(
                n_colors, 4
            )  # BGRA entries
            gray_pal = _luma(pal[:, [2, 1, 0]])
            return gray_pal[rows[:, :w]]
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        return _luma(bgr[..., ::-1])
    raise NotImplementedError(
        "unsupported image container (supported without codec "
        "libraries: PPM/P6, PGM/P5, uncompressed 8/24-bit BMP, PNG "
        "incl. Adam7, GIF, baseline+progressive JPEG, baseline TIFF, "
        "lossless WebP)"
    )


def _g711_decode_table(law: str) -> np.ndarray:
    """256-entry int16 expansion table for ITU-T G.711 ``"ulaw"`` /
    ``"alaw"``, built from the spec's segment formulas (8 segments,
    4-bit mantissa; mu-law carries a 0x84 bias, A-law XORs 0x55).
    Bit-identical to the classic expansion tables - cross-checked
    against stdlib ``audioop`` in tests."""
    codes = np.arange(256, dtype=np.int64)
    if law == "ulaw":
        u = ~codes & 0xFF
        t = ((((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 7))
        out = np.where(u & 0x80, 0x84 - t, t - 0x84)
    elif law == "alaw":
        a = codes ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a >> 4) & 7
        mag = np.where(seg == 0, t + 8,
                       (t + 0x108) << np.maximum(seg - 1, 0))
        out = np.where(a & 0x80, mag, -mag)
    else:
        raise ValueError("law must be 'ulaw' or 'alaw'")
    return out.astype(np.int16)


# ~8.4M samples/channel (= ~17 min at 8 kHz) keeps the interpreted
# per-nibble loop under ~10 s of executor CPU per payload
_IMA_MAX_SAMPLES = 1 << 23

_IMA_INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], np.int64
)
_IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767,
], np.int64)


def _ima_decode_nibbles(nibbles, pred: int, index: int):
    """IMA ADPCM inner loop: 4-bit codes -> int16 samples given the
    (predictor, step index) state; returns (samples list, pred,
    index).  The quantizer-step reconstruction is the standard IMA
    formula (diff = step/8 + bit-selected step/4, step/2, step)."""
    out = []
    for n in nibbles:
        step = int(_IMA_STEP_TABLE[index])
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        pred = pred - diff if n & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        out.append(pred)
        index = max(0, min(88, index + int(_IMA_INDEX_TABLE[n])))
    return out, pred, index


def _ima_adpcm_decode_block(block: bytes, ch: int):
    """One IMA ADPCM WAV block -> per-channel int16 sample lists.
    Block layout: a 4-byte header per channel (int16 predictor = the
    block's FIRST output sample, uint8 step index, reserved), then
    4-byte-per-channel interleaved nibble words, LOW nibble first."""
    if len(block) < 4 * ch:
        raise ValueError("truncated IMA ADPCM block header")
    chans, preds, idxs = [], [], []
    for c in range(ch):
        pred = int.from_bytes(block[4 * c:4 * c + 2], "little", signed=True)
        index = block[4 * c + 2]
        if index > 88:
            raise ValueError(f"IMA ADPCM step index {index} out of range")
        chans.append([pred])
        preds.append(pred)
        idxs.append(index)
    data = block[4 * ch:]
    for word_i in range(0, len(data), 4 * ch):
        for c in range(ch):
            word = data[word_i + 4 * c:word_i + 4 * (c + 1)]
            nibbles = []
            for byte in word:
                nibbles.append(byte & 0x0F)
                nibbles.append(byte >> 4)
            out, preds[c], idxs[c] = _ima_decode_nibbles(
                nibbles, preds[c], idxs[c]
            )
            chans[c].extend(out)
    return chans


def _wav_chunks(b: bytes):
    """RIFF/WAVE chunk walk: yields (fourcc, payload) pairs; returns
    None entries implicitly by just not yielding on truncation."""
    i = 12
    n = len(b)
    while i + 8 <= n:
        fourcc = b[i:i + 4]
        size = int.from_bytes(b[i + 4:i + 8], "little")
        yield fourcc, b[i + 8:min(i + 8 + size, n)]
        i += 8 + size + (size & 1)


def _decode_wav_fallback(b: bytes):
    """Fallback for WAV formats the stdlib ``wave`` module rejects:
    IEEE-float (format tag 3, 32/64-bit), G.711 mu-law (tag 7) /
    A-law (tag 6) via the expansion tables, and IMA ADPCM (tag 0x11)
    via the block decoder.  Returns ``(samples, sample_rate)`` or
    None if this is not a RIFF/WAVE or not one of those format
    tags."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    fmt = data = None
    fact_len = None  # dwSampleLength: true per-channel sample count
    for fourcc, payload in _wav_chunks(b):
        if fourcc == b"fmt " and fmt is None:
            fmt = payload
        elif fourcc == b"data" and data is None:
            data = payload
        elif fourcc == b"fact" and len(payload) >= 4:
            fact_len = int.from_bytes(payload[:4], "little") or None
    if fmt is None or len(fmt) < 16 or data is None:
        return None
    tag = int.from_bytes(fmt[0:2], "little")
    if tag not in (3, 6, 7, 0x11):
        return None
    ch = int.from_bytes(fmt[2:4], "little")
    sr = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if sr <= 0 or ch <= 0:
        raise ValueError(
            f"malformed WAV header: sample_rate={sr} channels={ch}"
        )
    if tag == 3:  # WAVE_FORMAT_IEEE_FLOAT
        if bits == 32:
            pcm = np.frombuffer(
                data[: len(data) - len(data) % 4], "<f4"
            ).astype(np.float64)
        elif bits == 64:
            pcm = np.frombuffer(
                data[: len(data) - len(data) % 8], "<f8"
            ).astype(np.float64)
        else:
            raise ValueError(
                f"IEEE-float WAV must be 32 or 64 bits/sample, got {bits}"
            )
        # nominal float range is [-1, 1]; clamp non-finite/overdriven
        pcm = np.clip(np.nan_to_num(pcm), -1.0, 1.0)
        if ch > 1:
            pcm = pcm[: len(pcm) - len(pcm) % ch].reshape(-1, ch).mean(axis=1)
        return pcm, sr
    if tag == 0x11:
        if bits != 4:
            raise ValueError(
                f"IMA ADPCM WAV must be 4 bits/sample, got {bits}"
            )
        block_align = int.from_bytes(fmt[12:14], "little")
        if block_align < 4 * ch:
            raise ValueError(
                f"IMA ADPCM block_align {block_align} below header size"
            )
        if 2 * len(data) > _IMA_MAX_SAMPLES * ch:
            # the nibble loop is interpreted Python (~1 s per 1M
            # samples): bound executor CPU like the image decoders'
            # megapixel caps do
            raise ValueError(
                f"IMA ADPCM data decodes to > {_IMA_MAX_SAMPLES} "
                "samples/channel, over the decoder resource bound"
            )
        spb = None  # wSamplesPerBlock caps per-block output when present
        if len(fmt) >= 20:
            spb = int.from_bytes(fmt[18:20], "little") or None
        chans = [[] for _ in range(ch)]
        for lo in range(0, len(data), block_align):
            block = _ima_adpcm_decode_block(data[lo:lo + block_align], ch)
            for c in range(ch):
                chans[c].extend(block[c][:spb])
        # a truncated final word can leave channels unequal - clip;
        # the fact chunk then bounds the true length (final-block
        # nibble padding decodes to samples past dwSampleLength)
        nmin = min(len(c) for c in chans)
        if fact_len is not None:
            nmin = min(nmin, fact_len)
        pcm = np.asarray(
            [c[:nmin] for c in chans], np.float64
        ).mean(axis=0) / (1 << 15)
        return pcm, sr
    law = {6: "alaw", 7: "ulaw"}[tag]
    if bits != 8:
        raise ValueError(f"G.711 WAV must be 8 bits/sample, got {bits}")
    pcm = _g711_decode_table(law)[
        np.frombuffer(data, np.uint8)
    ].astype(np.float64) / (1 << 15)
    if ch > 1:
        pcm = pcm[: len(pcm) - len(pcm) % ch].reshape(-1, ch).mean(axis=1)
    return pcm, sr


def decode_audio(payload: bytes):
    """REAL audio decode: integer PCM WAV (8/16/24/32-bit) via the
    stdlib ``wave`` module, plus IEEE-float WAV (format tag 3),
    G.711 mu-law/A-law WAV (tags 7/6), and IMA ADPCM WAV (tag 0x11),
    which ``wave`` rejects, via spec decoders.  Returns
    ``(samples, sample_rate)`` with samples as float64 in [-1, 1],
    channels mixed down by mean.  Other codecs raise
    ``NotImplementedError``."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(bytes(payload))) as wv:
            sr = wv.getframerate()
            ch = wv.getnchannels()
            sw = wv.getsampwidth()
            raw = wv.readframes(wv.getnframes())
    except (wave.Error, EOFError) as ex:
        fb = _decode_wav_fallback(bytes(payload))
        if fb is not None:
            return fb
        raise NotImplementedError(
            f"unsupported audio container ({ex}); only PCM, G.711, "
            "and IMA ADPCM WAV decode without codec libraries"
        ) from ex
    if sr <= 0 or ch <= 0:
        # wave only validates these on WRITE; a crafted header can
        # declare zero - reject instead of dividing by it downstream
        raise ValueError(
            f"malformed WAV header: sample_rate={sr} channels={ch}"
        )
    if sw == 2:
        pcm = np.frombuffer(raw, "<i2").astype(np.float64) / (1 << 15)
    elif sw == 1:  # WAV 8-bit is unsigned
        pcm = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128) / 128
    elif sw == 3:  # 24-bit packed little-endian
        raw = raw[: len(raw) - len(raw) % 3]
        b3 = np.frombuffer(raw, np.uint8).reshape(-1, 3).astype(np.int64)
        v = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
        pcm = (v - ((v & (1 << 23)) << 1)).astype(np.float64) / (1 << 23)
    elif sw == 4:
        pcm = np.frombuffer(raw, "<i4").astype(np.float64) / (1 << 31)
    else:
        raise NotImplementedError(f"{8 * sw}-bit PCM WAV not supported")
    if ch > 1:
        pcm = pcm.reshape(-1, ch).mean(axis=1)
    return pcm, sr


_AVI_MJPG_FOURCC = int.from_bytes(b"MJPG", "little")


def _dib_frame_to_gray(
    data: bytes, w: int, h: int, bottom_up: bool = True
) -> np.ndarray:
    """One uncompressed 24-bit DIB frame (BGR rows, stride padded to
    4 bytes, bottom-up unless the header said top-down) to (h, w)
    uint8 grayscale."""
    stride = ((24 * w + 31) // 32) * 4
    if len(data) < stride * h:
        raise ValueError("truncated DIB frame")
    rows = np.frombuffer(data, np.uint8, stride * h).reshape(h, stride)
    if bottom_up:
        rows = rows[::-1]
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    return _luma(bgr[..., ::-1])


def decode_video_frames(payload: bytes):
    """REAL video decode for AVI (RIFF container, 'vids' stream):
    yields (frame_index, (h, w) uint8 grayscale array) per
    '00db'/'00dc' chunk.  Two codecs decode for real:

    - uncompressed 24-bit DIB frames (either row order), and
    - **MJPEG** (biCompression 'MJPG'): every frame chunk is a
      standalone baseline JPEG handed to :func:`_decode_jpeg` with
      ``default_dht=True`` - the MJPEG/OpenDML rule that frames may
      omit Huffman tables and imply the T.81 Annex-K defaults.

    The frame format comes from the strf chunk BOUND TO the 'vids'
    strh (an AVI may carry audio streams whose strf is a
    WAVEFORMATEX, not a bitmap header).  Other codecs and containers
    (MP4/MKV/WebM need inter-frame entropy decoders) raise
    ``NotImplementedError``; truncated frame data raises
    ``ValueError``."""
    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise NotImplementedError(
            "unsupported video container (supported without codec "
            "libraries: uncompressed 24-bit AVI and MJPEG AVI)"
        )

    w = h = None
    bottom_up = True
    compression = bitcount = None
    last_strh_type = None

    def walk(lo: int, hi: int):
        nonlocal w, h, bottom_up, compression, bitcount, last_strh_type
        i = lo
        while i + 8 <= hi:
            fourcc = b[i : i + 4]
            size = int.from_bytes(b[i + 4 : i + 8], "little")
            data_lo = i + 8
            data_hi = min(data_lo + size, hi)
            if fourcc == b"LIST":
                yield from walk(data_lo + 4, data_hi)
            elif fourcc == b"strh":
                last_strh_type = b[data_lo : data_lo + 4]
            elif (
                fourcc == b"strf"
                and w is None
                and last_strh_type == b"vids"
            ):
                w = int.from_bytes(
                    b[data_lo + 4 : data_lo + 8], "little", signed=True
                )
                rawh = int.from_bytes(
                    b[data_lo + 8 : data_lo + 12], "little", signed=True
                )
                bottom_up = rawh > 0
                h = abs(rawh)
                bitcount = int.from_bytes(
                    b[data_lo + 14 : data_lo + 16], "little"
                )
                compression = int.from_bytes(
                    b[data_lo + 16 : data_lo + 20], "little"
                )
            elif fourcc[2:4] in (b"db", b"dc"):
                yield (data_lo, data_hi)
            i = data_hi + (size & 1)

    frame_idx = 0
    for data_lo, data_hi in walk(12, len(b)):
        if w is None:
            raise NotImplementedError(
                "AVI 'vids' stream format header missing"
            )
        if data_lo == data_hi:
            # zero-size frame chunk: the standard dropped/duplicate-
            # frame placeholder in capture AVIs - it occupies a frame
            # slot (timing) but carries no image
            frame_idx += 1
            continue
        if compression == _AVI_MJPG_FOURCC:
            chunk = b[data_lo:data_hi]
            if chunk[:2] != b"\xff\xd8":
                raise ValueError("MJPEG AVI frame chunk lacks JPEG SOI")
            yield frame_idx, _decode_jpeg(chunk, default_dht=True)
        elif compression == 0 and bitcount == 24:
            yield frame_idx, _dib_frame_to_gray(
                b[data_lo:data_hi], w, h, bottom_up
            )
        else:
            raise NotImplementedError(
                f"AVI biCompression={compression} biBitCount={bitcount}: "
                "only uncompressed 24-bit and MJPEG frames decode here"
            )
        frame_idx += 1


def _fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decoder: derives a (h, w) uint8 'image' from
    the payload digest so downstream plumbing is testable offline."""
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width), dtype=np.uint8)


def image_features(
    media: DataFrame,
    use_fake_decoder: bool = False,
    resize_to: tuple[int, int] = (8, 8),
) -> DataFrame:
    """Decode -> resize -> mean/std + tiny thumbnail-hash features.

    Arrow-batched mapInPandas over binary payloads.  The decode step
    is :func:`decode_image` (REAL for PPM/PGM/uncompressed BMP;
    ``NotImplementedError`` for compressed codecs this container
    cannot ship) or the deterministic digest fake when
    ``use_fake_decoder=True``.
    """

    rh, rw = resize_to

    def gen(batches):
        for pdf in batches:
            ids, means, stds, phash = [], [], [], []
            for mid, kind, payload, w, h in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"],
                pdf["width"], pdf["height"],
            ):
                if kind != "image":
                    continue
                img = (
                    _fake_decode_image(bytes(payload), int(w), int(h))
                    if use_fake_decoder
                    else decode_image(bytes(payload))
                )
                # box-resample resize to (rh, rw)
                ys = np.linspace(0, img.shape[0], rh + 1).astype(int)
                xs = np.linspace(0, img.shape[1], rw + 1).astype(int)
                small = np.array(
                    [
                        [
                            img[ys[i]: max(ys[i + 1], ys[i] + 1),
                                xs[j]: max(xs[j + 1], xs[j] + 1)].mean()
                            for j in range(rw)
                        ]
                        for i in range(rh)
                    ]
                )
                bits = (small > small.mean()).flatten()
                ph = int(
                    (bits.astype(np.uint64) << np.arange(bits.size, dtype=np.uint64)).sum()
                )
                ids.append(mid)
                means.append(float(img.mean()))
                stds.append(float(img.std()))
                phash.append(ph - (1 << 64) if ph >= (1 << 63) else ph)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "mean_intensity": pd.Series(means, dtype="float64"),
                    "std_intensity": pd.Series(stds, dtype="float64"),
                    "phash": pd.Series(phash, dtype="int64"),
                }
            )

    return media.mapInPandas(
        gen,
        "media_id long, mean_intensity double, std_intensity double, phash long",
    )


def audio_features(
    media: DataFrame,
    use_fake_decoder: bool = False,
    frame_ms: int = 25,
) -> DataFrame:
    """Decode -> per-clip loudness/zero-crossing features for audio
    rows: (media_id, duration_s, rms, zcr).  Same contract as
    image_features: Arrow-batched mapInPandas plumbing plus
    :func:`decode_audio` (REAL for PCM WAV via the stdlib wave
    module; ``NotImplementedError`` for compressed codecs), or the
    deterministic fake when ``use_fake_decoder=True``.  The sample
    rate comes from the WAV header, not the metadata column - the
    file is the truth."""

    def gen(batches):
        for pdf in batches:
            ids, durs, rmss, zcrs = [], [], [], []
            for mid, kind, payload, sr in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"],
                pdf["sample_rate"],
            ):
                if kind != "audio":
                    continue
                if use_fake_decoder:
                    sr = int(sr) or 16000
                    seed = int.from_bytes(
                        bytes(payload)[:8].ljust(8, b"\0"), "little"
                    )
                    rng = np.random.default_rng(seed ^ 0xA0D10)
                    n_samples = sr // 4 + (seed % sr)  # 0.25-1.25 s clip
                    pcm = rng.integers(
                        -(1 << 15), 1 << 15, size=n_samples, dtype=np.int32
                    ).astype(np.float64) / (1 << 15)
                else:
                    pcm, sr = decode_audio(bytes(payload))
                    n_samples = pcm.size
                ids.append(mid)
                durs.append(n_samples / sr)
                rmss.append(
                    float(np.sqrt(np.mean(pcm * pcm))) if n_samples else 0.0
                )
                zcrs.append(
                    float(
                        (np.signbit(pcm[1:]) != np.signbit(pcm[:-1])).mean()
                    )
                    if n_samples > 1
                    else 0.0
                )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "duration_s": pd.Series(durs, dtype="float64"),
                    "rms": pd.Series(rmss, dtype="float64"),
                    "zcr": pd.Series(zcrs, dtype="float64"),
                }
            )

    return media.mapInPandas(
        gen, "media_id long, duration_s double, rms double, zcr double"
    )


def frame_sample(
    media: DataFrame, every_n: int = 10, use_fake_decoder: bool = False
) -> DataFrame:
    """Sample every-nth frame index from video rows (metadata-driven;
    frame decode itself is the stubbed step)."""
    v = media.where(F.col("kind") == "video")
    if not use_fake_decoder:
        # plumbing-only path: emit the frame indices to be decoded
        return v.select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    raise NotImplementedError("no video codec in this environment")


def _render_pgm(w: int, h: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    return b"P5\n%d %d\n255\n" % (w, h) + img.tobytes()


def _render_ppm(w: int, h: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    return b"P6\n# synth\n%d %d\n255\n" % (w, h) + img.tobytes()


def _render_bmp24(w: int, h: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)  # RGB
    stride = ((24 * w + 31) // 32) * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    file_size = 54 + len(data)
    hdr = (
        b"BM"
        + file_size.to_bytes(4, "little")
        + b"\0\0\0\0"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return hdr + data


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        len(data).to_bytes(4, "big")
        + ctype
        + data
        + (zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _render_png(w: int, h: int, seed: int, color_type: int = 2) -> bytes:
    """Genuine PNG encoder (8-bit gray/gray+alpha/RGB/RGBA).  Row y
    uses filter type y % 5, so a decode roundtrip exercises every
    unfilter path including Average and Paeth."""
    import zlib

    ch = _PNG_CHANNELS[color_type]
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w * ch), dtype=np.uint8)
    lines = []
    prev = np.zeros(w * ch, np.int32)
    for y in range(h):
        f = y % 5
        row = img[y].astype(np.int32)
        enc = row.copy()
        for x in range(w * ch):
            left = int(row[x - ch]) if x >= ch else 0
            up = int(prev[x])
            ul = int(prev[x - ch]) if x >= ch else 0
            if f == 1:
                enc[x] = (row[x] - left) & 0xFF
            elif f == 2:
                enc[x] = (row[x] - up) & 0xFF
            elif f == 3:
                enc[x] = (row[x] - ((left + up) >> 1)) & 0xFF
            elif f == 4:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                if pa <= pb and pa <= pc:
                    pr = left
                elif pb <= pc:
                    pr = up
                else:
                    pr = ul
                enc[x] = (row[x] - pr) & 0xFF
        lines.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        prev = row
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _png_chunk(b"IEND", b"")
    )


def _render_gif(w: int, h: int, seed: int, interlaced: bool = False) -> bytes:
    """Genuine GIF89a encoder: 256-entry global color table and a
    spec-valid LZW stream using the classic 'uncompressed' trick
    (9-bit literal codes with a CLEAR every 254 codes so the width
    never grows).  ``interlaced=True`` stores rows in the 4-pass
    order and sets the interlace flag."""
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    rows = idx
    if interlaced:
        order = [y for start, step in _GIF_INTERLACE_PASSES
                 for y in range(start, h, step)]
        rows = idx[order]

    codes = [256]  # CLEAR
    for i, px in enumerate(rows.reshape(-1).tolist()):
        if i and i % 254 == 0:
            codes.append(256)
        codes.append(px)
    codes.append(257)  # EOI
    acc = nb = 0
    lzw = bytearray()
    for c in codes:  # LSB-first 9-bit packing
        acc |= c << nb
        nb += 9
        while nb >= 8:
            lzw.append(acc & 0xFF)
            acc >>= 8
            nb -= 8
    if nb:
        lzw.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0xF7, 0, 0])  # GCT present, 256 entries; bg 0
    out += pal.tobytes()
    out += bytes([0x2C]) + b"\x00\x00\x00\x00"
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlaced else 0x00])
    out += bytes([8])  # LZW minimum code size
    for off in range(0, len(lzw), 255):
        chunk = lzw[off:off + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


# Annex K (T.81) example quantization tables, natural order.  Public
# spec constants - the de-facto default of every JPEG encoder.
_JPEG_STD_LUM_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], np.float64)
_JPEG_STD_CHR_Q = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32, np.float64)

# T.81 Annex K "typical" Huffman tables (Tables K.3-K.6).  These are
# ALSO the tables the MJPEG/OpenDML spec mandates for AVI streams whose
# frames omit DHT segments, so the decoder can fall back to them
# (``_decode_jpeg(default_dht=True)``) and the encoder can emit
# streams that stay decodable without embedded tables.  Validated
# against libjpeg in tests (cjpeg emits exactly these by default:
# strip its DHT, decode with the fallback, compare).
# key: (table class 0=DC/1=AC, destination 0=luma/1=chroma)
_JPEG_STD_HUFF = {
    (0, 0): (  # Table K.3 - DC luminance
        [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
        bytes(range(12)),
    ),
    (0, 1): (  # Table K.4 - DC chrominance
        [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
        bytes(range(12)),
    ),
    (1, 0): (  # Table K.5 - AC luminance
        [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
        bytes([
            0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
            0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
            0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
            0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
            0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
            0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
            0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
            0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
            0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
            0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
            0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
            0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
            0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
            0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
            0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
            0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
            0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
            0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
            0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
            0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
            0xF9, 0xFA,
        ]),
    ),
    (1, 1): (  # Table K.6 - AC chrominance
        [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
        bytes([
            0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
            0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
            0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
            0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
            0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
            0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
            0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
            0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
            0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
            0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
            0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
            0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
            0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
            0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
            0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
            0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
            0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
            0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
            0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
            0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
            0xF9, 0xFA,
        ]),
    ),
}


def _jpeg_enc_table(counts, vals) -> dict:
    """Canonical Huffman (counts, values) -> {symbol: (code, nbits)}
    for the encoder side (decode side is ``_jpeg_huff_table``)."""
    enc = {}
    code = 0
    vi = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            enc[vals[vi]] = (code, ln)
            code += 1
            vi += 1
        code <<= 1
    return enc


class _JpegBitWriter:
    """MSB-first bit writer with 0xFF byte stuffing (T.81 B.1.1.5)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (v & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.put(0x7F >> (7 - ((8 - self.n) % 8)), (8 - self.n) % 8)


def _render_jpeg(
    w: int,
    h: int,
    seed: int,
    *,
    gray: bool = False,
    subsampling: str = "444",
    quality: int = 75,
    restart_interval: int = 0,
    blocky: bool = False,
    tables: str = "uniform",
    emit_dht: bool = True,
) -> bytes:
    """Genuine baseline JPEG encoder (pure NumPy): forward DCT over
    Annex-K quant tables scaled by ``quality`` (libjpeg's public
    50-point scaling), canonical Huffman entropy coding with simple
    uniform code tables (valid per T.81; compression ratio is not the
    point), single interleaved scan, optional 4:2:0 chroma
    subsampling and restart markers.  ``blocky=True`` renders an
    image that is constant within each 8x8 tile, for which the only
    reconstruction error is DC quantization (tight analytic bound in
    tests).

    ``tables="annexk"`` entropy-codes with the T.81 Annex-K typical
    Huffman tables instead of the uniform ones; ``emit_dht=False``
    (valid only with Annex-K tables) omits the DHT segments entirely,
    producing the MJPEG-style stream that decoders must handle via
    the spec-default tables."""
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    if tables not in ("uniform", "annexk"):
        raise ValueError("tables must be 'uniform' or 'annexk'")
    if not emit_dht and tables != "annexk":
        raise ValueError("emit_dht=False requires the Annex-K tables")
    rng = np.random.default_rng(seed)
    if blocky:
        tiles = rng.integers(16, 240, size=(-(-h // 8), -(-w // 8), 3))
        rgb = np.repeat(np.repeat(tiles, 8, 0), 8, 1)[:h, :w].astype(
            np.float64
        )
    else:
        base = rng.integers(0, 256, size=(h, w, 3)).astype(np.float64)
        ramp = np.add.outer(
            np.linspace(0, 64, h), np.linspace(0, 64, w)
        )[..., None]
        rgb = np.clip(0.5 * base + ramp + 32, 0, 255)
    r, g, bch = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * bch
    cb = -0.168736 * r - 0.331264 * g + 0.5 * bch + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * bch + 128.0

    q = max(1, min(100, quality))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    ql = np.clip((_JPEG_STD_LUM_Q * scale + 50) // 100, 1, 255)
    qc = np.clip((_JPEG_STD_CHR_Q * scale + 50) // 100, 1, 255)
    ql_zz, qc_zz = ql[_JPEG_ZZ], qc[_JPEG_ZZ]

    sub = subsampling == "420" and not gray
    if gray:
        planes = [(y, ql_zz, 1, 1)]
    elif sub:
        eh, ew = -(-h // 2) * 2, -(-w // 2) * 2
        pad = np.pad(np.stack([cb, cr]), ((0, 0), (0, eh - h), (0, ew - w)),
                     mode="edge")
        ds = pad.reshape(2, eh // 2, 2, ew // 2, 2).mean(axis=(2, 4))
        planes = [(y, ql_zz, 2, 2), (ds[0], qc_zz, 1, 1),
                  (ds[1], qc_zz, 1, 1)]
    else:
        planes = [(y, ql_zz, 1, 1), (cb, qc_zz, 1, 1), (cr, qc_zz, 1, 1)]

    hmax = max(p[2] for p in planes)
    vmax = max(p[3] for p in planes)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # pad every plane to its MCU-aligned block grid (edge replication)
    comp_blocks = []
    for plane, qzz, ch, cv in planes:
        ph, pw = plane.shape
        th, tw = mcus_y * cv * 8, mcus_x * ch * 8
        plane = np.pad(plane, ((0, th - ph), (0, tw - pw)), mode="edge")
        # all blocks DCT'd + quantized in one vectorized pass
        blk = plane.reshape(th // 8, 8, tw // 8, 8).transpose(0, 2, 1, 3)
        coef = _JPEG_A @ (blk - 128.0) @ _JPEG_A.T
        zzc = coef.reshape(th // 8, tw // 8, 64)[..., _JPEG_ZZ]
        qv = np.round(zzc / qzz).astype(np.int64)
        comp_blocks.append(qv)

    if tables == "annexk":
        dht_specs = {k: _JPEG_STD_HUFF[k] for k in _JPEG_STD_HUFF}
    else:
        # uniform canonical Huffman tables: 12 DC symbols at length 5,
        # 255 AC symbols at length 9 (code == symbol; none all-ones;
        # 0xFF = run 15/size 15 can never be emitted since size <= 10)
        dc_counts = [0] * 16
        dc_counts[4] = 12
        dc_vals = bytes(range(12))
        ac_counts = [0] * 16
        ac_counts[8] = 255
        ac_vals = bytes(range(255))
        uni = {(0, 0): (dc_counts, dc_vals), (1, 0): (ac_counts, ac_vals)}
        dht_specs = {**uni, (0, 1): uni[0, 0], (1, 1): uni[1, 0]}
    enc_tabs = {k: _jpeg_enc_table(*spec) for k, spec in dht_specs.items()}

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
            + payload

    nf = len(planes)
    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(ql_zz.astype(np.uint8)))
    if nf > 1:
        out += seg(0xDB, bytes([1]) + bytes(qc_zz.astype(np.uint8)))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([nf])
    for ci, (_, _, ch, cv) in enumerate(planes):
        sof += bytes([ci + 1, (ch << 4) | cv, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    if emit_dht:
        for (tc, th) in ((0, 0), (1, 0)) if nf == 1 else (
            (0, 0), (1, 0), (0, 1), (1, 1)
        ):
            counts, vals = dht_specs[tc, th]
            out += seg(
                0xC4, bytes([(tc << 4) | th]) + bytes(counts) + vals
            )
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([nf])
    for ci in range(nf):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    def coef_bits(v):
        """(size category, value bits) for a coefficient (T.81 F.1.2)."""
        s = int(abs(v)).bit_length()
        return s, (v if v >= 0 else v + (1 << s) - 1)

    bw = _JpegBitWriter()
    preds = [0] * nf
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.flush()
            out += bw.out
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw = _JpegBitWriter()
            preds = [0] * nf
        mx, my = mcu % mcus_x, mcu // mcus_x
        for ci, (_, _, ch, cv) in enumerate(planes):
            dc_tab = enc_tabs[0, 0 if ci == 0 else 1]
            ac_tab = enc_tabs[1, 0 if ci == 0 else 1]
            for by in range(cv):
                for bx in range(ch):
                    zzq = comp_blocks[ci][my * cv + by, mx * ch + bx]
                    s, bits_v = coef_bits(int(zzq[0]) - preds[ci])
                    preds[ci] = int(zzq[0])
                    bw.put(*dc_tab[s])
                    if s:
                        bw.put(bits_v, s)
                    run = 0
                    for k in range(1, 64):
                        v = int(zzq[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            bw.put(*ac_tab[0xF0])  # ZRL
                            run -= 16
                        s, bits_v = coef_bits(v)
                        bw.put(*ac_tab[(run << 4) | s])
                        bw.put(bits_v, s)
                        run = 0
                    if run:
                        bw.put(*ac_tab[0x00])      # EOB
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _synth_pcm16(sr: int, n_samples: int, seed: int) -> np.ndarray:
    """Shared deterministic test signal (sine + noise) for ALL WAV
    renderers: the codec-accuracy tests compare G.711/ADPCM decodes
    against the PCM rendering of the same (sr, n, seed), so the
    signal must stay bit-identical across renderers."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples, dtype=np.float64)
    freq = 100.0 + (seed % 400)
    sig = 0.5 * np.sin(2 * np.pi * freq * t / sr) + 0.1 * rng.standard_normal(
        n_samples
    )
    return np.clip(
        sig * (1 << 14), -(1 << 15), (1 << 15) - 1
    ).astype("<i2")


def _packbits_encode(row: bytes) -> bytes:
    """Per-row TIFF PackBits encoder: runs of >= 3 identical bytes as
    repeat packets, everything else as literal packets."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            nxt = 1
            while i + nxt < n and nxt < 3 and row[i + nxt] == row[i]:
                nxt += 1
            if nxt >= 3:
                break
            i += 1
        out += bytes([i - lit_start - 1]) + row[lit_start:i]
    return bytes(out)


def _render_tiff(
    w: int,
    h: int,
    seed: int,
    *,
    rgb: bool = True,
    packbits: bool = False,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """Genuine baseline TIFF: header + one IFD + strips.  Covers both
    byte orders, gray/RGB, multi-strip layouts, and PackBits."""
    rng = np.random.default_rng(seed)
    spp = 3 if rgb else 1
    px = rng.integers(0, 256, size=(h, w, spp), dtype=np.uint8)
    bo = "big" if big_endian else "little"
    rps = rows_per_strip or h
    row_bytes = w * spp

    strips = []
    for lo in range(0, h, rps):
        chunk = px[lo:lo + rps].tobytes()
        if packbits:
            # encode row-at-a-time per the spec recommendation
            enc = bytearray()
            for r in range(0, len(chunk), row_bytes):
                enc += _packbits_encode(chunk[r:r + row_bytes])
            strips.append(bytes(enc))
        else:
            strips.append(chunk)

    def u(x, n):
        return int(x).to_bytes(n, bo)

    n_strips = len(strips)
    entries = []  # (tag, type, count, values)
    # IFD layout: header(8) + ifd; strip data after all IFD machinery
    def add(tag, typ, vals):
        entries.append((tag, typ, vals))

    add(256, 4, [w])
    add(257, 4, [h])
    add(258, 3, [8] * spp)
    add(259, 3, [32773 if packbits else 1])
    add(262, 3, [2 if rgb else 1])
    add(273, 4, [0] * n_strips)  # patched below
    add(277, 3, [spp])
    add(278, 4, [rps])
    add(279, 4, [len(s) for s in strips])
    add(284, 3, [1])  # chunky planar (explicit so tests can patch it)
    entries.sort()
    _SZ = {3: 2, 4: 4}
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    # external value areas for entries whose payload exceeds 4 bytes
    ext_off = ifd_off + ifd_size
    ext = bytearray()
    locs = {}
    for tag, typ, vals in entries:
        total = _SZ[typ] * len(vals)
        if total > 4:
            locs[tag] = ext_off + len(ext)
            ext += b"".join(u(v, _SZ[typ]) for v in vals)
    data_off = ext_off + len(ext)
    offs = []
    pos = data_off
    for s_ in strips:
        offs.append(pos)
        pos += len(s_)

    def entry_bytes(tag, typ, vals):
        if tag == 273:
            vals = offs
        total = _SZ[typ] * len(vals)
        out = u(tag, 2) + u(typ, 2) + u(len(vals), 4)
        if total <= 4:
            return out + (
                b"".join(u(v, _SZ[typ]) for v in vals) + b"\x00" * 4
            )[:4]
        return out + u(locs[tag], 4)

    if 273 in locs:  # write real offsets into the external area
        # (the placeholder zeros were appended in the first pass, so
        # data_off and offs are already consistent)
        rel = locs[273] - ext_off
        ext[rel:rel + 4 * n_strips] = b"".join(u(o, 4) for o in offs)

    hdr = (b"MM\x00*" if big_endian else b"II*\x00") + u(ifd_off, 4)
    ifd = u(len(entries), 2) + b"".join(
        entry_bytes(t, ty, v) for t, ty, v in entries
    ) + u(0, 4)
    return hdr + ifd + bytes(ext) + b"".join(strips)


class _Vp8lBitWriter:
    """LSB-first bit writer (the inverse of ``_Vp8lBits``)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v: int, nbits: int) -> None:
        self.acc |= (v & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def done(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _render_webp(w: int, h: int, seed: int) -> bytes:
    """Genuine lossless WebP: a minimal VP8L encoder emitting a
    deterministic two-color pattern through 1-bit 'simple' Huffman
    codes (no transforms, no cache - every field is real bitstream
    per the spec, just with a trivial symbol set).  Canonical code
    assignment gives the SMALLER symbol value code 0, matching the
    reference table builder.  Decodes identically under libwebp and
    :func:`_decode_webp` (cross-checked in tests)."""
    rng = np.random.default_rng(seed)
    # two colors differing in every channel so each channel gets a
    # genuine 2-symbol code
    c0 = rng.integers(0, 128, 3)
    c1 = c0 + rng.integers(64, 128, 3)
    mask = rng.integers(0, 2, (h, w))
    bw = _Vp8lBitWriter()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)  # no alpha hint
    bw.put(0, 3)  # version
    bw.put(0, 1)  # no transforms
    bw.put(0, 1)  # no color cache
    bw.put(0, 1)  # no meta-huffman

    def simple2(a, b):
        bw.put(1, 1)  # simple code
        bw.put(1, 1)  # two symbols
        bw.put(1, 1)  # 8-bit first symbol
        bw.put(a, 8)
        bw.put(b, 8)

    def simple1(a):
        bw.put(1, 1)
        bw.put(0, 1)  # one symbol (zero-bit code)
        bw.put(1, 1)
        bw.put(a, 8)

    chans = []  # (code0 value, code1 value) per channel in g, r, b order
    for ci, comp in ((1, "g"), (0, "r"), (2, "b")):
        a, b = int(c0[ci]), int(c1[ci])
        lo, hi = (a, b) if a < b else (b, a)
        simple2(lo, hi)
        # mask value 0 -> c0; map to canonical code bit
        chans.append((0 if a < b else 1, 1 if a < b else 0))
    simple1(255)  # alpha
    simple1(0)    # distance (never used)
    for y in range(h):
        for x in range(w):
            m = int(mask[y, x])
            for bit0, bit1 in chans:
                bw.put(bit1 if m else bit0, 1)
    payload = b"\x2f" + bw.done()
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) % 2:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _render_wav(sr: int, n_samples: int, seed: int) -> bytes:
    import io
    import wave

    pcm = _synth_pcm16(sr, n_samples, seed)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(sr)
        wv.writeframes(pcm.tobytes())
    return buf.getvalue()


def _g711_encode(pcm16: np.ndarray, law: str) -> np.ndarray:
    """int16 -> G.711 code bytes by nearest decoded value (exact
    segment search is not needed for a synth renderer; the decode
    table IS the contract)."""
    tab = _g711_decode_table(law).astype(np.int64)
    order = np.argsort(tab, kind="stable")
    sv = tab[order]
    x = pcm16.astype(np.int64)
    idx = np.clip(np.searchsorted(sv, x), 1, 255)
    lo = idx - 1
    pick = np.where(np.abs(sv[idx] - x) < np.abs(x - sv[lo]), idx, lo)
    return order[pick].astype(np.uint8)


def _ima_encode(pcm16: np.ndarray, index: int = 0) -> tuple:
    """Standard IMA ADPCM encoder for one block (mono): int16 samples
    -> (first sample, block step index, nibble codes for samples[1:],
    final step index).  The caller carries the running step index
    across blocks (that is what the block header is for - resetting
    it would re-run the adaptation transient every block).  The
    encoder mirrors the decoder's reconstruction so state never
    drifts."""
    pred = int(pcm16[0])
    start_index = index
    codes = []
    for x in pcm16[1:]:
        step = int(_IMA_STEP_TABLE[index])
        diff = int(x) - pred
        n = 0
        if diff < 0:
            n = 8
            diff = -diff
        if diff >= step:
            n |= 4
            diff -= step
        if diff >= step >> 1:
            n |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            n |= 1
        # reconstruct exactly as the decoder will
        out, pred, index = _ima_decode_nibbles([n], pred, index)
        codes.append(n)
    return int(pcm16[0]), start_index, codes, index


def _render_wav_ima_adpcm(sr: int, n_samples: int, seed: int) -> bytes:
    """Genuine IMA ADPCM WAV (format tag 0x11, mono): 4-byte block
    header (predictor, step index) + low-nibble-first codes, 505
    samples per 256-byte block, same deterministic signal as
    :func:`_render_wav`."""
    pcm = _synth_pcm16(sr, n_samples, seed)
    block_align = 256
    spb = (block_align - 4) * 2 + 1  # 505
    blocks = []
    total = 0
    run_index = 0
    for lo in range(0, n_samples, spb):
        chunk = pcm[lo:lo + spb]
        first, index, codes, run_index = _ima_encode(chunk, run_index)
        codes += [0] * ((block_align - 4) * 2 - len(codes))  # pad block
        packed = bytes(
            (codes[i] & 0x0F) | (codes[i + 1] << 4)
            for i in range(0, len(codes), 2)
        )
        blocks.append(
            int(first).to_bytes(2, "little", signed=True)
            + bytes([index, 0]) + packed
        )
        total += len(chunk)
    fmt = (
        (0x11).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + int(sr).to_bytes(4, "little")
        + (int(sr) * block_align // spb).to_bytes(4, "little")
        + block_align.to_bytes(2, "little") + (4).to_bytes(2, "little")
        + (2).to_bytes(2, "little") + spb.to_bytes(2, "little")
    )
    body = (
        b"WAVE"
        + _riff_chunk(b"fmt ", fmt)
        + _riff_chunk(b"fact", total.to_bytes(4, "little"))
        + _riff_chunk(b"data", b"".join(blocks))
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _render_wav_g711(sr: int, n_samples: int, seed: int, law: str) -> bytes:
    """Genuine G.711 WAV (format tag 7 mu-law / 6 A-law, 8 bits per
    sample, mono) with the same deterministic test signal as
    :func:`_render_wav`; includes the 'fact' chunk the WAV spec
    requires for non-PCM formats."""
    pcm = _synth_pcm16(sr, n_samples, seed)
    codes = _g711_encode(pcm, law)
    tag = 7 if law == "ulaw" else 6
    fmt = (
        tag.to_bytes(2, "little") + (1).to_bytes(2, "little")
        + int(sr).to_bytes(4, "little") + int(sr).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
        + (0).to_bytes(2, "little")  # cbSize
    )
    body = (
        b"WAVE"
        + _riff_chunk(b"fmt ", fmt)
        + _riff_chunk(b"fact", n_samples.to_bytes(4, "little"))
        + _riff_chunk(b"data", codes.tobytes())
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def video_frame_features(
    media: DataFrame, every_n: int = 10
) -> DataFrame:
    """Sample every ``every_n``-th frame of AVI video rows
    (uncompressed or MJPEG) and REALLY decode it
    (:func:`decode_video_frames`):
    (media_id, frame_idx, mean_intensity, std_intensity) per sampled
    frame, Arrow-batched like the other extractors."""

    def gen(batches):
        for pdf in batches:
            ids, fidx, means, stds = [], [], [], []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                for fi, frame in decode_video_frames(bytes(payload)):
                    if fi % every_n:
                        continue
                    ids.append(mid)
                    fidx.append(fi)
                    means.append(float(frame.mean()))
                    stds.append(float(frame.std()))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int64"),
                    "mean_intensity": pd.Series(means, dtype="float64"),
                    "std_intensity": pd.Series(stds, dtype="float64"),
                }
            )

    return media.mapInPandas(
        gen,
        "media_id long, frame_idx long, mean_intensity double, "
        "std_intensity double",
    )


def _riff_chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\0" if len(data) % 2 else b""
    return fourcc + len(data).to_bytes(4, "little") + data + pad


def _riff_list(fourcc: bytes, *parts: bytes) -> bytes:
    body = fourcc + b"".join(parts)
    return b"LIST" + len(body).to_bytes(4, "little") + body


def _render_avi(
    w: int,
    h: int,
    n_frames: int,
    seed: int,
    *,
    codec: str = "dib",
    emit_dht: bool = True,
) -> bytes:
    """Minimal AVI: RIFF(hdrl(avih, strl(strh 'vids', strf
    BITMAPINFOHEADER), movi(frames)).  ``codec="dib"`` writes
    uncompressed 24-bit '00db' frames; ``codec="mjpg"`` writes one
    genuine baseline JPEG per '00dc' chunk (Annex-K entropy tables;
    ``emit_dht=False`` omits per-frame DHT the way hardware MJPEG
    encoders do, exercising the spec-default-table decode path)."""
    if codec not in ("dib", "mjpg"):
        raise ValueError("codec must be 'dib' or 'mjpg'")
    rng = np.random.default_rng(seed)
    stride = ((24 * w + 31) // 32) * 4

    def u32(x):
        return int(x).to_bytes(4, "little")

    mjpg = codec == "mjpg"
    fcc = b"MJPG" if mjpg else b"DIB "
    avih = b"".join(
        [u32(40000), u32(0), u32(0), u32(0), u32(n_frames), u32(0),
         u32(1), u32(stride * h), u32(w), u32(h)] + [u32(0)] * 4
    )
    strh = b"vids" + fcc + b"".join(
        [u32(0), u32(0), u32(0), u32(1), u32(25), u32(0),
         u32(n_frames), u32(stride * h), u32(0), u32(0)]
    ) + (0).to_bytes(8, "little")
    strf = b"".join(
        [u32(40), u32(w), u32(h), (1).to_bytes(2, "little"),
         (24).to_bytes(2, "little"),
         u32(_AVI_MJPG_FOURCC if mjpg else 0), u32(stride * h),
         u32(2835), u32(2835), u32(0), u32(0)]
    )
    frames = []
    for fi in range(n_frames):
        if mjpg:
            frames.append(_riff_chunk(b"00dc", _render_jpeg(
                w, h, seed + 7919 * fi,
                tables="annexk", emit_dht=emit_dht,
            )))
            continue
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
        frames.append(_riff_chunk(b"00db", rows.tobytes()))
    body = (
        b"AVI "
        + _riff_list(
            b"hdrl",
            _riff_chunk(b"avih", avih),
            _riff_list(
                b"strl",
                _riff_chunk(b"strh", strh),
                _riff_chunk(b"strf", strf),
            ),
        )
        + _riff_list(b"movi", *frames)
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def synth_media_real(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic media table whose payloads are GENUINE encoded
    containers (rotating PGM/PPM/BMP/PNG/JPEG - incl. 4:2:0 with
    restart markers and grayscale - plus GIF, baseline TIFF
    (multi-strip and PackBits/big-endian slots), and lossless WebP
    for images; PCM, G.711
    mu-law/A-law, and IMA ADPCM WAV for audio; uncompressed 24-bit
    and MJPEG AVI - incl. DHT-less frames - for video) so the real
    decoders run end to end with no external data."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                kind = ("image", "audio", "video")[i % 3]
                w, h = 16 + (i % 16), 12 + (i % 8)
                sr = 8000
                n_frames = 0
                if kind == "image":
                    renderer = (
                        _render_pgm,
                        _render_ppm,
                        _render_bmp24,
                        lambda w, h, s: _render_png(w, h, s, 2),
                        lambda w, h, s: _render_png(w, h, s, 0),
                        lambda w, h, s: _render_png(w, h, s, 6),
                        lambda w, h, s: _render_jpeg(w, h, s),
                        lambda w, h, s: _render_jpeg(
                            w, h, s, subsampling="420", restart_interval=2
                        ),
                        lambda w, h, s: _render_jpeg(w, h, s, gray=True),
                        _render_gif,
                        lambda w, h, s: _render_gif(w, h, s, interlaced=True),
                        lambda w, h, s: _render_tiff(w, h, s, rows_per_strip=5),
                        lambda w, h, s: _render_tiff(
                            w, h, s, rgb=False, packbits=True, big_endian=True
                        ),
                        _render_webp,
                    )[(i // 3) % 14]
                    payload = renderer(w, h, seed + i)
                elif kind == "audio":
                    ns = 2000 + (i % 1000)
                    payload = (
                        lambda: _render_wav(sr, ns, seed + i),
                        lambda: _render_wav_g711(sr, ns, seed + i, "ulaw"),
                        lambda: _render_wav_g711(sr, ns, seed + i, "alaw"),
                        lambda: _render_wav_ima_adpcm(sr, ns, seed + i),
                    )[(i // 3) % 4]()
                else:
                    n_frames = 6 + (i % 5)
                    payload = (
                        lambda: _render_avi(w, h, n_frames, seed + i),
                        lambda: _render_avi(
                            w, h, n_frames, seed + i, codec="mjpg"
                        ),
                        lambda: _render_avi(
                            w, h, n_frames, seed + i, codec="mjpg",
                            emit_dht=False,
                        ),
                    )[(i // 3) % 3]()
                rows.append(
                    (
                        i, kind, payload, w, h,
                        sr if kind == "audio" else 0,
                        n_frames,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "payload", "width", "height",
                    "sample_rate", "n_frames",
                ],
            )

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def synth_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table in MEDIA_SCHEMA shape."""
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].tolist()
            rows = []
            for i in ids:
                kind = ("image", "audio", "video")[i % 3]
                payload = (i * 2654435761 + seed).to_bytes(8, "little") * 4
                rows.append(
                    (
                        i, kind, payload,
                        32 + (i % 32), 32 + (i % 16),
                        16000 if kind == "audio" else 0,
                        120 if kind == "video" else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "payload", "width", "height",
                    "sample_rate", "n_frames",
                ],
            )

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)
