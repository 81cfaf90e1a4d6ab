"""USTAR shard round-trip semantics (sources/tar.py — WebDataset-style
ingest). Our writer is cross-validated against stdlib tarfile's reader and
our reader against tarfile's writer, so neither direction can drift from
the spec unnoticed."""

from __future__ import annotations

import gzip
import io
import tarfile

import pytest

from apmbackend_spark.sources.tar import read_tar, write_tar

MEMBERS = [
    ("00000001.txt", b"hello tar world"),
    ("00000002.txt", b""),  # zero-size member: pure header, no blocks
    ("00000003.txt", b"x" * 512),  # exactly one block, no padding
    ("00000004.txt", b"y" * 513),  # crosses a block boundary
    ("dir_like.name-08", bytes(range(256))),  # binary content survives
]


def test_our_writer_read_by_stdlib_tarfile():
    buf = write_tar(MEMBERS)
    with tarfile.open(fileobj=io.BytesIO(buf), mode="r:") as tf:
        got = [
            (m.name, tf.extractfile(m).read() if m.size else b"")
            for m in tf.getmembers()
        ]
    assert got == MEMBERS


def test_stdlib_tarfile_archive_read_by_our_reader():
    bio = io.BytesIO()
    with tarfile.open(fileobj=bio, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in MEMBERS:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(data))
    got = read_tar(bio.getvalue())
    assert got == MEMBERS


def test_roundtrip_our_both_directions():
    assert read_tar(write_tar(MEMBERS)) == MEMBERS
    assert read_tar(write_tar([])) == []


def test_reader_rejects_corruption_and_truncation():
    buf = bytearray(write_tar(MEMBERS))
    buf[4] ^= 0x01  # flip a name byte -> checksum mismatch
    with pytest.raises(ValueError, match="checksum"):
        read_tar(bytes(buf))
    good = write_tar(MEMBERS)
    with pytest.raises(ValueError, match="truncated"):
        read_tar(good[: 512 + 4])  # header + torn content
    bad_magic = bytearray(good)
    bad_magic[257] = 0  # kill the ustar magic, fix the checksum back up
    h = bad_magic[0:512]
    h[148:156] = b" " * 8
    chk = sum(h)
    h[148:156] = f"{chk:06o}\x00 ".encode()
    bad_magic[0:512] = h
    with pytest.raises(ValueError, match="magic"):
        read_tar(bytes(bad_magic))


def test_gate_shards_and_fingerprints(spark):
    # 37 docs at shard_size 16 -> shards of 16/16/5; every member lands
    # exactly once with the right name, byte count, and per-shard grouping
    from apmbackend_spark.sources.tar import synth_tar_shards, tar_members

    docs = spark.createDataFrame(
        [(i, f"text body {i} " + "z" * (i % 7)) for i in range(37)],
        "doc_id long, text string",
    )
    shards = synth_tar_shards(docs)
    raw = {r["shard_id"]: bytes(r["content"]) for r in shards.collect()}
    assert sorted(raw) == [0, 1, 2]
    # shard bytes are REAL .tar.gz: stdlib end-to-end read-back
    names = []
    for sid in sorted(raw):
        with tarfile.open(
            fileobj=io.BytesIO(gzip.decompress(raw[sid])), mode="r:"
        ) as tf:
            names += [m.name for m in tf.getmembers()]
    assert names == [f"{i:08d}.txt" for i in range(37)]
    rows = {
        r["member_name"]: r for r in tar_members(shards).collect()
    }
    for i in range(37):
        r = rows[f"{i:08d}.txt"]
        assert r["shard_id"] == i // 16
        assert r["text"] == f"text body {i} " + "z" * (i % 7)
        assert r["n_bytes"] == len(r["text"].encode())
