"""TensorBoard event-writer: wire-format round-trip + CRC vectors."""

import glob
import struct

import numpy as np

from geobignn_tpu.train import tb_writer as tb


def test_crc32c_vectors():
    # RFC 3720 / standard CRC32C test vectors
    assert tb.crc32c(b"") == 0
    assert tb.crc32c(b"123456789") == 0xE3069283
    assert tb.crc32c(b"\x00" * 32) == 0x8A9136AA


def test_varint_negative_terminates():
    """protobuf int64 encodes negatives as 10-byte two's complement; the
    naive n >>= 7 loop would never terminate for n < 0."""
    enc = tb._varint(-1)
    assert enc == b"\xff" * 9 + b"\x01"
    # round-trip through the test-side decoder
    val = 0
    for i, b in enumerate(enc):
        val |= (b & 0x7F) << (7 * i)
    assert val == (1 << 64) - 1  # two's complement of -1


def _read_records(path):
    out = []
    with open(path, "rb") as f:
        data = f.read()
    off = 0
    while off < len(data):
        (ln,) = struct.unpack_from("<Q", data, off)
        header = data[off : off + 8]
        (hcrc,) = struct.unpack_from("<I", data, off + 8)
        assert hcrc == tb._masked_crc(header)
        payload = data[off + 12 : off + 12 + ln]
        (pcrc,) = struct.unpack_from("<I", data, off + 12 + ln)
        assert pcrc == tb._masked_crc(payload)
        out.append(payload)
        off += 12 + ln + 4
    return out


def _parse_fields(buf):
    """Minimal independent protobuf walk: {field: [raw values]}."""
    fields = {}
    off = 0
    while off < len(buf):
        key = 0
        shift = 0
        while True:
            b = buf[off]
            off += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        num, wt = key >> 3, key & 7
        if wt == 0:
            val = 0
            shift = 0
            while True:
                b = buf[off]
                off += 1
                val |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wt == 1:
            val = struct.unpack_from("<d", buf, off)[0]
            off += 8
        elif wt == 2:
            ln = 0
            shift = 0
            while True:
                b = buf[off]
                off += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            val = buf[off : off + ln]
            off += ln
        elif wt == 5:
            val = struct.unpack_from("<f", buf, off)[0]
            off += 4
        else:
            raise AssertionError(f"wire type {wt}")
        fields.setdefault(num, []).append(val)
    return fields


def test_event_file_roundtrip(tmp_path):
    w = tb.EventWriter(str(tmp_path / "train"))
    w.add_scalar("loss", 0.125, step=3)
    w.add_scalars({"error_v": 1.5, "error_f": 2.5}, step=7)
    w.close()

    (path,) = glob.glob(str(tmp_path / "train" / "events.out.tfevents.*"))
    records = _read_records(path)
    assert len(records) == 3

    first = _parse_fields(records[0])
    assert first[3] == [b"brain.Event:2"]

    ev = _parse_fields(records[1])
    assert ev[2] == [3]  # step
    summary = _parse_fields(ev[5][0])
    value = _parse_fields(summary[1][0])
    assert value[1] == [b"loss"]
    np.testing.assert_allclose(value[2], [0.125])

    ev2 = _parse_fields(records[2])
    assert ev2[2] == [7]
    tags = {
        _parse_fields(v)[1][0]: _parse_fields(v)[2][0]
        for v in _parse_fields(ev2[5][0])[1]
    }
    assert tags[b"error_v"] == 1.5 and tags[b"error_f"] == 2.5


def test_metric_logger_emits_tb(tmp_path):
    from geobignn_tpu.train.logging import MetricLogger

    ml = MetricLogger(str(tmp_path / "metrics.jsonl"))
    ml.log("train", epoch=0, loss=1.0)
    ml.log("test", epoch=0, error_f=5.0)
    ml.close()
    assert glob.glob(str(tmp_path / "tb" / "train" / "events.*"))
    assert glob.glob(str(tmp_path / "tb" / "test" / "events.*"))
