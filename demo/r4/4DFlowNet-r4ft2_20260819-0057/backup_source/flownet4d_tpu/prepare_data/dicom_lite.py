"""Vendored minimal DICOM reader (no pydicom dependency).

The ingest walk (reference: /root/reference/src/prepare_data/DicomData.py:9-29
via ``pydicom.dcmread``) needs exactly four header attributes plus the pixel
volume: PixelSpacing, SliceThickness, SequenceName and PixelData (with the
Rows/Columns/BitsAllocated/PixelRepresentation geometry tags that decode it).
This module implements just enough of PS3.10/PS3.5 to read those from
uncompressed little-endian files — the format Siemens 4D-flow exports use —
so :func:`flownet4d_tpu.prepare_data.dicom.ingest_case` runs in environments
without pydicom. When pydicom *is* installed it is preferred (see
``dicom.load_dicom_volume``).

Supported transfer syntaxes: Explicit VR Little Endian (1.2.840.10008.1.2.1)
and Implicit VR Little Endian (1.2.840.10008.1.2). Compressed syntaxes raise
a clear error naming pydicom as the fallback.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

EXPLICIT_VR_LE = "1.2.840.10008.1.2.1"
IMPLICIT_VR_LE = "1.2.840.10008.1.2"

# VRs whose explicit form uses a 2-byte reserved field + 4-byte length.
_LONG_VRS = {b"OB", b"OW", b"OF", b"OL", b"OD", b"SQ", b"UC", b"UR", b"UT", b"UN"}

_TAG_PIXEL_SPACING = (0x0028, 0x0030)
_TAG_SLICE_THICKNESS = (0x0018, 0x0050)
_TAG_SEQUENCE_NAME = (0x0018, 0x0024)
_TAG_TRIGGER_TIME = (0x0018, 0x1060)
_TAG_ROWS = (0x0028, 0x0010)
_TAG_COLUMNS = (0x0028, 0x0011)
_TAG_BITS_ALLOCATED = (0x0028, 0x0100)
_TAG_PIXEL_REPRESENTATION = (0x0028, 0x0103)
_TAG_PIXEL_DATA = (0x7FE0, 0x0010)
_TAG_TRANSFER_SYNTAX = (0x0002, 0x0010)

_WANTED = {
    _TAG_PIXEL_SPACING,
    _TAG_SLICE_THICKNESS,
    _TAG_SEQUENCE_NAME,
    _TAG_TRIGGER_TIME,
    _TAG_ROWS,
    _TAG_COLUMNS,
    _TAG_BITS_ALLOCATED,
    _TAG_PIXEL_REPRESENTATION,
    _TAG_PIXEL_DATA,
}

_ITEM = (0xFFFE, 0xE000)
_ITEM_DELIM = (0xFFFE, 0xE00D)
_SEQ_DELIM = (0xFFFE, 0xE0DD)


@dataclass
class DicomLiteSlice:
    """The slice attributes the ingest pipeline reads (pydicom-compatible
    attribute names so ``load_dicom_volume`` can use either library)."""

    PixelSpacing: list[float] = field(default_factory=list)
    SliceThickness: float = 0.0
    SequenceName: str = ""
    TriggerTime: float | None = None
    Rows: int = 0
    Columns: int = 0
    BitsAllocated: int = 16
    PixelRepresentation: int = 0
    _pixel_bytes: bytes = b""

    @property
    def pixel_array(self) -> np.ndarray:
        if self.BitsAllocated == 16:
            dt = np.int16 if self.PixelRepresentation else np.uint16
        elif self.BitsAllocated == 8:
            dt = np.int8 if self.PixelRepresentation else np.uint8
        else:
            raise ValueError(f"Unsupported BitsAllocated={self.BitsAllocated}")
        arr = np.frombuffer(self._pixel_bytes, dtype=np.dtype(dt).newbyteorder("<"))
        n = self.Rows * self.Columns
        if arr.size < n:
            raise ValueError(
                f"PixelData too short: {arr.size} px for {self.Rows}x{self.Columns}"
            )
        return arr[:n].reshape(self.Rows, self.Columns)


def _decimal_strings(raw: bytes) -> list[float]:
    text = raw.decode("ascii", "ignore").strip("\x00 ")
    return [float(p) for p in text.split("\\") if p.strip()]


def _skip_undefined_sequence(buf: bytes, pos: int) -> int:
    """Advance past an undefined-length SQ/item region (PS3.5 §7.5)."""
    depth = 1
    while depth > 0:
        if pos + 8 > len(buf):
            raise ValueError("Truncated DICOM sequence")
        group, elem, length = struct.unpack_from("<HHI", buf, pos)
        pos += 8
        tag = (group, elem)
        if tag == _SEQ_DELIM:
            depth -= 1
        elif tag == _ITEM:
            if length == 0xFFFFFFFF:
                # Undefined-length item: contents are plain elements; keep
                # scanning — its delimiter decrements nothing here because
                # items nest datasets, so treat delimiters pairwise.
                depth += 1
            else:
                pos += length
        elif tag == _ITEM_DELIM:
            depth -= 1
        else:
            # Element inside an undefined-length item (implicit VR layout in
            # this scan — good enough to skip over, we never *read* these).
            if length == 0xFFFFFFFF:
                depth += 1
            else:
                pos += length
    return pos


def _parse_dataset(buf: bytes, pos: int, explicit: bool, slice_: DicomLiteSlice,
                   stop_after_group2: bool = False) -> int:
    """Parse data elements from ``pos``; fill wanted attributes. Returns the
    final position (end of buffer, or first non-group-2 element when
    ``stop_after_group2``)."""
    ts = None
    while pos + 8 <= len(buf):
        group, elem = struct.unpack_from("<HH", buf, pos)
        tag = (group, elem)
        if stop_after_group2 and group != 0x0002:
            return pos
        hdr = pos + 4
        if tag in (_ITEM, _ITEM_DELIM, _SEQ_DELIM):
            length = struct.unpack_from("<I", buf, hdr)[0]
            pos = hdr + 4
            if tag == _ITEM and length not in (0, 0xFFFFFFFF):
                pos += length
            continue
        if explicit:
            vr = buf[hdr:hdr + 2]
            if vr in _LONG_VRS:
                length = struct.unpack_from("<I", buf, hdr + 4)[0]
                value_pos = hdr + 8
            else:
                length = struct.unpack_from("<H", buf, hdr + 2)[0]
                value_pos = hdr + 4
        else:
            vr = b""
            length = struct.unpack_from("<I", buf, hdr)[0]
            value_pos = hdr + 4

        if length == 0xFFFFFFFF:
            # Undefined length: SQ (or encapsulated pixel data, which we
            # reject earlier via transfer syntax). Skip to its delimiter.
            pos = _skip_undefined_sequence(buf, value_pos)
            continue

        value = buf[value_pos:value_pos + length]
        pos = value_pos + length

        if tag == _TAG_TRANSFER_SYNTAX:
            ts = value.decode("ascii", "ignore").strip("\x00 ")
            slice_.__dict__["_transfer_syntax"] = ts
        elif tag in _WANTED:
            if tag == _TAG_PIXEL_SPACING:
                slice_.PixelSpacing = _decimal_strings(value)
            elif tag == _TAG_SLICE_THICKNESS:
                vals = _decimal_strings(value)
                slice_.SliceThickness = vals[0] if vals else 0.0
            elif tag == _TAG_SEQUENCE_NAME:
                slice_.SequenceName = value.decode("ascii", "ignore").strip("\x00 ")
            elif tag == _TAG_TRIGGER_TIME:
                vals = _decimal_strings(value)
                slice_.TriggerTime = vals[0] if vals else None
            elif tag == _TAG_ROWS:
                slice_.Rows = struct.unpack("<H", value[:2])[0]
            elif tag == _TAG_COLUMNS:
                slice_.Columns = struct.unpack("<H", value[:2])[0]
            elif tag == _TAG_BITS_ALLOCATED:
                slice_.BitsAllocated = struct.unpack("<H", value[:2])[0]
            elif tag == _TAG_PIXEL_REPRESENTATION:
                slice_.PixelRepresentation = struct.unpack("<H", value[:2])[0]
            elif tag == _TAG_PIXEL_DATA:
                slice_._pixel_bytes = value
    return pos


def dcmread(path: str) -> DicomLiteSlice:
    """Read one uncompressed little-endian DICOM file.

    Drop-in for the subset of ``pydicom.dcmread`` the ingest walk uses:
    the returned object exposes ``pixel_array``, ``PixelSpacing``,
    ``SliceThickness``, ``SequenceName`` and ``TriggerTime``.
    """
    with open(path, "rb") as f:
        buf = f.read()

    slice_ = DicomLiteSlice()
    if len(buf) > 132 and buf[128:132] == b"DICM":
        # File meta (group 0002) is always explicit VR LE.
        pos = _parse_dataset(buf, 132, explicit=True, slice_=slice_,
                             stop_after_group2=True)
        ts = slice_.__dict__.get("_transfer_syntax", EXPLICIT_VR_LE)
        if ts not in (EXPLICIT_VR_LE, IMPLICIT_VR_LE):
            raise ValueError(
                f"Unsupported transfer syntax {ts!r} in {path}: the vendored "
                "reader handles uncompressed little-endian only; install "
                "pydicom for compressed DICOMs."
            )
        _parse_dataset(buf, pos, explicit=(ts == EXPLICIT_VR_LE), slice_=slice_)
    else:
        # Raw dataset without preamble. Sniff explicit VR: bytes 4:6 of the
        # first element are an uppercase-ASCII VR code in explicit files.
        explicit = buf[4:6].isalpha() and buf[4:6].isupper()
        _parse_dataset(buf, 0, explicit=explicit, slice_=slice_)
    return slice_
