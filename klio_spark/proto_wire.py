"""KlioMessage protobuf wire-format codec, dependency-free.

The reference's on-the-wire contract is ``KlioMessage.SerializeToString()``
(core/src/klio_core/proto/klio.proto:28-89, serializer.py:58-168). The
protobuf python package isn't in this container, but the proto3 *wire
format* is a public, stable spec (varint tags, length-delimited fields),
so this module hand-encodes/decodes exactly the KlioMessage shape:

    KlioMessage{ metadata=1, data=2, version=3 }
      Metadata{ downstream=1*, visited=2*, job_audit_log=3,
                force=4, ping=5, intended_recipients=6 }
        Recipients{ oneof anyone=1 | limited=2 }
          Limited{ recipients=1, trigger_children_of=2 }
      Data{ entity_id=1, payload=2, element=3 }
    KlioJob{ job_name=1, gcp_project=2, inputs=3* }
    KlioJobAuditLogItem{ timestamp=1 (google.protobuf.Timestamp), klio_job=2 }

(* v1-deprecated fields: tolerated on decode, never emitted on encode.)

Bytes produced here parse with the reference's generated classes and
vice versa — true interop with existing klio jobs, not a lookalike.
The dict shape used on the Python side mirrors the envelope columns
(klio_spark.envelope.ENVELOPE_FIELDS).
"""

from __future__ import annotations

import datetime
import io
from typing import Any

# proto3 wire types
_VARINT, _I64, _LEN, _I32 = 0, 1, 2, 5


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _uvarint(n: int) -> bytes:
    out = bytearray()
    n &= (1 << 64) - 1  # two's-complement for negative int64 (proto3 rule)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(buf: io.BytesIO) -> int:
    shift = acc = 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise ValueError("truncated varint")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc
        shift += 7


def _tag(field: int, wtype: int) -> bytes:
    return _uvarint((field << 3) | wtype)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, _LEN) + _uvarint(len(payload)) + payload


def _varint_field(field: int, value: int) -> bytes:
    # proto3 omits default (0/false) scalar fields
    if not value:
        return b""
    return _tag(field, _VARINT) + _uvarint(int(value))


def _skip(buf: io.BytesIO, wtype: int) -> None:
    if wtype == _VARINT:
        _read_uvarint(buf)
    elif wtype == _I64:
        buf.read(8)
    elif wtype == _LEN:
        buf.read(_read_uvarint(buf))
    elif wtype == _I32:
        buf.read(4)
    else:
        raise ValueError(f"unknown wire type {wtype}")


def _fields(blob: bytes):
    """Yield (field_number, wire_type, value) — value is int for varint,
    bytes for length-delimited; other types are skipped."""
    buf = io.BytesIO(blob)
    while True:
        head = buf.read(1)
        if not head:
            return
        buf.seek(-1, 1)
        key = _read_uvarint(buf)
        field, wtype = key >> 3, key & 7
        if wtype == _VARINT:
            yield field, wtype, _read_uvarint(buf)
        elif wtype == _LEN:
            yield field, wtype, buf.read(_read_uvarint(buf))
        else:
            _skip(buf, wtype)


# ---------------------------------------------------------------------------
# sub-messages
# ---------------------------------------------------------------------------

def _enc_job(job: dict | None) -> bytes:
    if not job:
        return b""
    out = b""
    if job.get("job_name"):
        out += _len_field(1, job["job_name"].encode())
    if job.get("project"):
        out += _len_field(2, job["project"].encode())
    return out


def _dec_job(blob: bytes) -> dict:
    job = {"job_name": None, "project": None}
    for field, wtype, val in _fields(blob):
        if field == 1 and wtype == _LEN:
            job["job_name"] = val.decode()
        elif field == 2 and wtype == _LEN:
            job["project"] = val.decode()
        # field 3 (v1 JobInput) tolerated & ignored
    return job


def _enc_timestamp(ts: datetime.datetime) -> bytes:
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=datetime.timezone.utc)
    epoch = ts.timestamp()
    seconds = int(epoch // 1)
    nanos = ts.microsecond * 1000
    return _varint_field(1, seconds) + _varint_field(2, nanos)


def _dec_timestamp(blob: bytes) -> datetime.datetime:
    seconds = nanos = 0
    for field, wtype, val in _fields(blob):
        if field == 1 and wtype == _VARINT:
            # Timestamp.seconds is int64: a negative (pre-1970) value
            # arrives as its two's-complement 64-bit varint — re-sign it,
            # or fromtimestamp(~2^64) raises and the whole message drops
            seconds = val - (1 << 64) if val >= (1 << 63) else val
        elif field == 2 and wtype == _VARINT:
            nanos = val
    return datetime.datetime.fromtimestamp(
        seconds, tz=datetime.timezone.utc
    ) + datetime.timedelta(microseconds=nanos // 1000)


def _enc_audit_item(item: dict) -> bytes:
    out = b""
    ts = item.get("ts")
    if ts is not None:
        out += _len_field(1, _enc_timestamp(ts))
    out += _len_field(2, _enc_job(item))
    return out


def _dec_audit_item(blob: bytes) -> dict:
    item: dict[str, Any] = {"ts": None, "job_name": None, "project": None}
    for field, wtype, val in _fields(blob):
        if field == 1 and wtype == _LEN:
            item["ts"] = _dec_timestamp(val)
        elif field == 2 and wtype == _LEN:
            item.update(_dec_job(val))
    return item


def _enc_recipients(mode: str | None, recipients, trigger) -> bytes:
    if mode == "limited":
        limited = b"".join(_len_field(1, _enc_job(j)) for j in recipients or [])
        if trigger:
            limited += _len_field(2, _enc_job(trigger))
        return _len_field(2, limited)
    if mode == "anyone":
        return _len_field(1, b"")  # empty Anyone stub, presence = meaning
    return b""


# ---------------------------------------------------------------------------
# KlioMessage
# ---------------------------------------------------------------------------

def encode_klio_message(msg: dict) -> bytes:
    """Envelope-shaped dict → KlioMessage bytes (klio.proto field order)."""
    meta = b""
    for item in msg.get("job_audit_log") or []:
        meta += _len_field(3, _enc_audit_item(item))
    meta += _varint_field(4, bool(msg.get("force")))
    meta += _varint_field(5, bool(msg.get("ping")))
    rec = _enc_recipients(
        msg.get("recipients_mode"),
        msg.get("recipients"),
        msg.get("trigger_children_of"),
    )
    if rec:
        meta += _len_field(6, rec)

    data = b""
    version = int(msg.get("version") or 2)
    element = msg.get("element")
    if version <= 1:
        if element:
            data += _len_field(1, str(element).encode())  # entity_id
    else:
        if element:
            data += _len_field(3, str(element).encode())
    payload = msg.get("payload")
    if payload:
        data += _len_field(2, bytes(payload))

    out = b""
    if meta:
        out += _len_field(1, meta)
    if data:
        out += _len_field(2, data)
    out += _varint_field(3, version)
    return out


def decode_klio_message(blob: bytes) -> dict:
    """KlioMessage bytes → envelope-shaped dict. Unknown fields skipped
    (forward compatibility); v1 entity_id folds into element."""
    msg: dict[str, Any] = {
        "element": None,
        "payload": None,
        "version": 0,
        "force": False,
        "ping": False,
        "recipients_mode": None,
        "recipients": None,
        "trigger_children_of": None,
        "job_audit_log": [],
    }
    entity_id = None
    for field, wtype, val in _fields(blob):
        if field == 1 and wtype == _LEN:  # metadata
            for mf, mw, mv in _fields(val):
                if mf == 3 and mw == _LEN:
                    msg["job_audit_log"].append(_dec_audit_item(mv))
                elif mf == 4 and mw == _VARINT:
                    msg["force"] = bool(mv)
                elif mf == 5 and mw == _VARINT:
                    msg["ping"] = bool(mv)
                elif mf == 6 and mw == _LEN:
                    for rf, rw, rv in _fields(mv):
                        if rf == 1 and rw == _LEN:
                            msg["recipients_mode"] = "anyone"
                        elif rf == 2 and rw == _LEN:
                            msg["recipients_mode"] = "limited"
                            recips = []
                            trigger = None
                            for lf, lw, lv in _fields(rv):
                                if lf == 1 and lw == _LEN:
                                    recips.append(_dec_job(lv))
                                elif lf == 2 and lw == _LEN:
                                    trigger = _dec_job(lv)
                            msg["recipients"] = recips or None
                            msg["trigger_children_of"] = trigger
                # mf 1/2 (downstream/visited, v1) tolerated & ignored
        elif field == 2 and wtype == _LEN:  # data
            for df, dw, dv in _fields(val):
                if df == 1 and dw == _LEN:
                    entity_id = dv.decode(errors="replace")
                elif df == 2 and dw == _LEN:
                    msg["payload"] = dv
                elif df == 3 and dw == _LEN:
                    msg["element"] = dv.decode(errors="replace")
        elif field == 3 and wtype == _VARINT:
            msg["version"] = val
    if msg["element"] is None and entity_id is not None:
        msg["element"] = entity_id  # v1 entity_id → element (serializer.py:23-53)
        msg["version"] = msg["version"] or 1
    return msg
