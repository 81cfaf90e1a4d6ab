"""WebDataset-style tar-shard ingest — training corpora ship as (gzipped)
tar shards of member files (WebDataset / tarp conventions, public
literature), and a pipeline that cannot round-trip that container cannot
ingest real training data.

Both directions are OURS on the stdlib path: the writer emits
spec-compliant USTAR (POSIX.1-1988) — 512-byte headers with octal fields,
the space-seeded checksum, content blocks padded to 512, two zero blocks
of trailer — and the reader walks the blocks back, VERIFYING the header
checksum and the ustar magic (a torn shard or a flipped byte raises, it
never yields garbage members). Shards are deflate-compressed with the
stdlib gzip wrapper (mtime pinned to 0 so shard bytes are deterministic);
the graded values are the DECOMPRESSED member contents, so the gate is
independent of compressor version drift.

Grading: one archive per shard of ``SHARD_SIZE`` docs (member name
``{doc_id:08d}.txt``, content the raw utf-8 text), built executor-side in
``applyInPandas`` over the shard group; extraction is ``mapInPandas`` over
shard bytes; the graded row is (shard_id, member_name, n_bytes, text_fp)
with the fingerprint computed JVM-side by ``hash64`` over the decoded
text — the oracle derives all four straight from the documents table, so
a single corrupted byte anywhere in write -> gzip -> gunzip -> parse ->
decode flips a fingerprint.

Scale shape (100 TB): shard build is one ``shard_id`` shuffle with
SHARD_SIZE-bounded groups (the WebDataset writer's shape); extraction is
embarrassingly parallel over shards; only (shard, member, fp) rows — never
text — survive past the scan. Cross-validated against stdlib ``tarfile``
in both directions in pytest.

Reference parity note: the reference (a Node.js APM stack) has no archive
ingest; this is beyond-reference LLM-pipeline surface like sources/orc.py.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash64, hash64_sql

SHARD_SIZE = 16


# ---------------------------------------------------------------------------
# USTAR writer/reader (ours, stdlib-only).
# ---------------------------------------------------------------------------


def _tar_header(name: str, size: int) -> bytes:
    nb = name.encode("utf-8")
    if len(nb) > 100:
        raise ValueError(f"member name too long for ustar: {name!r}")
    h = bytearray(512)
    h[0 : len(nb)] = nb
    h[100:108] = b"0000644\x00"  # mode
    h[108:116] = b"0000000\x00"  # uid
    h[116:124] = b"0000000\x00"  # gid
    h[124:136] = f"{size:011o}\x00".encode()  # size, octal
    h[136:148] = f"{0:011o}\x00".encode()  # mtime 0: deterministic bytes
    h[148:156] = b" " * 8  # checksum seeded with spaces per spec
    h[156] = ord("0")  # typeflag: regular file
    h[257:263] = b"ustar\x00"  # magic
    h[263:265] = b"00"  # version
    chk = sum(h)
    h[148:156] = f"{chk:06o}\x00 ".encode()
    return bytes(h)


def write_tar(members: list[tuple[str, bytes]]) -> bytes:
    """Spec-compliant USTAR archive of (name, content) members, in order."""
    out = bytearray()
    for name, data in members:
        out += _tar_header(name, len(data))
        out += data
        out += b"\x00" * ((-len(data)) % 512)
    out += b"\x00" * 1024  # end-of-archive trailer
    return bytes(out)


def read_tar(buf: bytes) -> list[tuple[str, bytes]]:
    """Walk the 512-byte blocks back; VERIFY each header's checksum and
    ustar magic; raise on truncation rather than yield partial members."""
    pos = 0
    out: list[tuple[str, bytes]] = []
    while pos + 512 <= len(buf):
        h = buf[pos : pos + 512]
        if h == b"\x00" * 512:  # trailer
            break
        stored = int(h[148:156].split(b"\x00")[0].strip() or b"0", 8)
        calc = sum(h[:148]) + 8 * 0x20 + sum(h[156:])
        if stored != calc:
            raise ValueError(f"tar header checksum mismatch at {pos}")
        if h[257:262] != b"ustar":
            raise ValueError(f"missing ustar magic at {pos}")
        name = h[0:100].split(b"\x00")[0].decode("utf-8")
        size = int(h[124:136].split(b"\x00")[0] or b"0", 8)
        pos += 512
        data = buf[pos : pos + size]
        if len(data) < size:
            raise ValueError(f"truncated member {name!r}")
        out.append((name, bytes(data)))
        pos += size + ((-size) % 512)
    return out


# ---------------------------------------------------------------------------
# Spark surface + graded gate.
# ---------------------------------------------------------------------------


def synth_tar_shards(
    documents: DataFrame, shard_size: int = SHARD_SIZE
) -> DataFrame:
    """(shard_id, content): one gzipped USTAR shard per ``shard_size``
    consecutive doc_ids, members sorted by doc_id — built executor-side
    in applyInPandas over the shard group (bytes never visit the
    driver)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        members = [
            (f"{int(i):08d}.txt", ("" if t is None else t).encode("utf-8"))
            for i, t in zip(pdf["doc_id"], pdf["text"])
        ]
        raw = write_tar(members)
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["shard_id"].iloc[0])],
                "content": [gzip.compress(raw, 6, mtime=0)],
            }
        )

    return (
        documents.select(
            "doc_id",
            "text",
            F.expr(f"doc_id div {int(shard_size)}").alias("shard_id"),
        )
        .groupBy("shard_id")
        .applyInPandas(build, "shard_id long, content binary")
    )


def tar_members(shards: DataFrame) -> DataFrame:
    """Extract every member of every shard: gunzip -> checksum-verified
    ustar walk -> utf-8 decode. mapInPandas over shard bytes."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                for name, data in read_tar(gzip.decompress(bytes(r.content))):
                    rows.append(
                        {
                            "shard_id": r.shard_id,
                            "member_name": name,
                            "n_bytes": len(data),
                            "text": data.decode("utf-8"),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["shard_id", "member_name", "n_bytes", "text"],
            )

    return shards.mapInPandas(
        fn,
        schema="shard_id long, member_name string, n_bytes long, text string",
    )


def tar_shard_ingest(
    documents: DataFrame, shard_size: int = SHARD_SIZE
) -> DataFrame:
    """Graded round-trip: documents -> gzipped ustar shards -> extract ->
    (shard_id, member_name, n_bytes, text_fp). The fingerprint rides
    hash64 JVM-side over the DECODED text, so the hash proves the whole
    container path byte-lossless; the oracle derives every column
    directly from the documents table."""
    m = tar_members(synth_tar_shards(documents, shard_size))
    return m.select(
        "shard_id",
        "member_name",
        "n_bytes",
        hash64(F.coalesce(F.col("text"), F.lit(""))).alias("text_fp"),
    )


def tar_shard_ingest_oracle_sql(shard_size: int = SHARD_SIZE) -> str:
    return f"""
SELECT doc_id // {int(shard_size)} AS shard_id,
       format('{{:08d}}', doc_id) || '.txt' AS member_name,
       CAST(octet_length(encode(COALESCE(text, ''))) AS BIGINT) AS n_bytes,
       {hash64_sql("COALESCE(text, '')")} AS text_fp
FROM documents
"""
