"""TensorBoard event-file writer, dependency-free.

The reference logs training scalars to TensorBoard via mxboard
(reference doc/TENSORBOARD.md:10-28, core/detection_metric.py:16-18). This
is the parity implementation: it writes real `events.out.tfevents.*` files
that `tensorboard --logdir` loads, without importing tensorflow/tensorboard
at train time. Two small formats are hand-rolled:

- protobuf wire format for tensorboard.Event / Summary / Summary.Value
  (field numbers from tensorboard/compat/proto/event.proto + summary.proto:
  Event{wall_time=1 double, step=2 int64, file_version=3 string,
  summary=5 msg}; Summary{value=1 repeated}; Value{tag=1 string,
  simple_value=2 float}).
- TFRecord framing: uint64-LE length, masked CRC-32C of the length bytes,
  payload, masked CRC-32C of the payload (mask = rotr15(crc) + 0xa282ead8).

Verified against the real tensorboard EventAccumulator in
tests/test_aux.py::test_tb_event_writer.
"""
import os
import struct
import time

_CRC_TABLE = []


def _crc32c_table():
    if not _CRC_TABLE:
        poly = 0x82F63B78  # Castagnoli, reflected
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ (poly if c & 1 else 0)
            _CRC_TABLE.append(c)
    return _CRC_TABLE


def crc32c(data, crc=0):
    table = _crc32c_table()
    crc ^= 0xFFFFFFFF
    for byte in data:
        crc = table[(crc ^ byte) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data):
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _tag(field, wire_type):
    return _varint((field << 3) | wire_type)


def _varint(n):
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field_bytes(field, payload):
    return _tag(field, 2) + _varint(len(payload)) + payload


def _field_double(field, value):
    return _tag(field, 1) + struct.pack("<d", value)


def _field_varint(field, value):
    # int64: negative values use 10-byte two's-complement varint
    return _tag(field, 0) + _varint(value & 0xFFFFFFFFFFFFFFFF)


def _summary_value(tag, value):
    v = _field_bytes(1, tag.encode("utf-8"))
    v += _tag(2, 5) + struct.pack("<f", value)  # simple_value: float
    return v


def _event(wall_time, step=None, file_version=None, scalars=None):
    ev = _field_double(1, wall_time)
    if step is not None:
        ev += _field_varint(2, step)
    if file_version is not None:
        ev += _field_bytes(3, file_version.encode("utf-8"))
    if scalars:
        summary = b"".join(_field_bytes(1, _summary_value(t, x))
                           for t, x in scalars)
        ev += _field_bytes(5, summary)
    return ev


class TBEventWriter:
    """Append-only events.out.tfevents writer (scalars only)."""

    def __init__(self, logdir):
        os.makedirs(logdir, exist_ok=True)
        fname = "events.out.tfevents.%d.%s" % (int(time.time()),
                                               os.uname().nodename)
        self.path = os.path.join(logdir, fname)
        self._f = open(self.path, "ab")
        self._write_record(_event(time.time(), file_version="brain.Event:2"))

    def _write_record(self, payload):
        header = struct.pack("<Q", len(payload))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(payload)
        self._f.write(struct.pack("<I", _masked_crc(payload)))

    def add_scalar(self, tag, value, global_step=None):
        self._write_record(_event(time.time(), step=global_step or 0,
                                  scalars=[(tag, float(value))]))
        self._f.flush()

    def close(self):
        self._f.close()
