#!/usr/bin/env python3
"""EXTERNAL verification of graft-written Delta and Iceberg tables.

Independent, shared-nothing re-implementations of the two table-format
read paths, written purely against the public specs (delta.io
PROTOCOL.md; iceberg.apache.org/spec) in Python over duckdb + pyarrow —
no graft code, no Spark, no format jars. For each fixture table written
by `graft.ExtFixture`, this reconstructs the table's logical content
from the on-disk metadata alone and compares it to the ground-truth
parquet dump the fixture computed directly from its input data.

Covered surface:
  Delta   : log JSON replay, checkpoint parquet + _last_checkpoint,
            partitionValues re-attachment, additive schema evolution,
            deletion vectors (Z85 uuids, sidecar slice framing, 64-bit
            portable RoaringBitmapArray), MERGE rewrites.
  Iceberg : version-hint / vN.metadata.json, snapshot -> manifest-list
            Avro -> manifest Avro (hand-rolled Avro container + datum
            reader, null codec), field-id column resolution via parquet
            field ids, schema.name-mapping.default fallback, position
            deletes, equality deletes with sequence-number ordering,
            renames, int->long promotion.

Usage: tools/extcheck.py <fixture-dir>   (default /tmp/extfix)
"""
import glob
import json
import os
import re
import struct
import zlib
import sys
import uuid as uuidlib

import duckdb
import pandas as pd
import pyarrow.parquet as pq

# ---------------------------------------------------------------------------
# Z85 (ZeroMQ base-85) — Delta encodes DV uuids and inline DVs with it
# ---------------------------------------------------------------------------

_Z85_ALPHABET = ("0123456789abcdefghijklmnopqrstuvwxyz"
                 "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")
_Z85_DECODE = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_decode(s: str) -> bytes:
    assert len(s) % 5 == 0, f"Z85 length {len(s)}"
    out = bytearray()
    for i in range(0, len(s), 5):
        acc = 0
        for c in s[i:i + 5]:
            acc = acc * 85 + _Z85_DECODE[c]
        out += acc.to_bytes(4, "big")
    return bytes(out)


# ---------------------------------------------------------------------------
# RoaringBitmap portable formats (RoaringFormatSpec + Delta's 64-bit array)
# ---------------------------------------------------------------------------

def _read_roaring32(buf: bytes, off: int):
    """Parse one 32-bit portable RoaringBitmap at `off`; returns
    (sorted value list, next offset)."""
    (cookie,) = struct.unpack_from("<i", buf, off)
    if cookie & 0xFFFF == 12347:  # SERIAL_COOKIE: run containers possible
        size = (cookie >> 16) + 1
        off += 4
        run_flags = buf[off:off + (size + 7) // 8]
        off += (size + 7) // 8
        has_run = lambda i: (run_flags[i // 8] >> (i % 8)) & 1
        with_offsets = size >= 4
    elif cookie == 12346:  # SERIAL_COOKIE_NO_RUNCONTAINER
        (size,) = struct.unpack_from("<i", buf, off + 4)
        off += 8
        has_run = lambda i: 0
        with_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    keys, cards = [], []
    for i in range(size):
        k, c = struct.unpack_from("<HH", buf, off)
        keys.append(k)
        cards.append(c + 1)
        off += 4
    if with_offsets:
        off += 4 * size  # container offsets — recomputed by the walk below
    values = []
    for i in range(size):
        base = keys[i] << 16
        if has_run(i):
            (n_runs,) = struct.unpack_from("<H", buf, off)
            off += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, off)
                off += 4
                values.extend(base | v for v in range(start, start + length + 1))
        elif cards[i] <= 4096:
            vals = struct.unpack_from(f"<{cards[i]}H", buf, off)
            off += 2 * cards[i]
            values.extend(base | v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", buf, off)
            off += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(base | (wi * 64 + b.bit_length() - 1))
                    w ^= b
    return values, off


def roaring64_array_decode(buf: bytes, off: int = 0, magic: bool = True):
    """Portable 64-bit RoaringBitmapArray (delta PROTOCOL.md "Deletion
    Vector Format"; identical to the RoaringFormatSpec 64-bit portable
    extension with a magic prefix, and to Iceberg v3's deletion-vector
    blob payload): int32-LE magic 1681511377, int64-LE count of NON-EMPTY
    32-bit buckets, then per bucket an int32-LE key (high 32 bits)
    followed by that bucket's standard portable 32-bit serialization,
    keys strictly increasing."""
    if magic:
        (m,) = struct.unpack_from("<i", buf, off)
        assert m == 1681511377, f"bad DV magic {m}"
        off += 4
    (count,) = struct.unpack_from("<q", buf, off)
    off += 8
    out = []
    last_key = -1
    for _ in range(count):
        (key,) = struct.unpack_from("<I", buf, off)
        off += 4
        assert key > last_key, f"DV bucket keys not increasing ({last_key}->{key})"
        last_key = key
        vals, off = _read_roaring32(buf, off)
        out.extend((key << 32) | v for v in vals)
    return set(out)


# ---------------------------------------------------------------------------
# Avro object container + generic datum reader (null codec)
# ---------------------------------------------------------------------------

class _AvroCursor:
    def __init__(self, buf: bytes, off: int = 0):
        self.buf, self.off = buf, off

    def raw(self, n):
        b = self.buf[self.off:self.off + n]
        self.off += n
        return b

    def zlong(self):
        shift = acc = 0
        while True:
            b = self.buf[self.off]
            self.off += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def zbytes(self):
        return self.raw(self.zlong())

    def zstring(self):
        return self.zbytes().decode("utf-8")


def _avro_datum(cur: _AvroCursor, schema):
    """Schema-driven decode of one datum. Supports the types graft's
    manifests use: primitives, records, unions, arrays, maps."""
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return cur.raw(1) != b"\x00"
        if t in ("int", "long"):
            return cur.zlong()
        if t == "float":
            return struct.unpack("<f", cur.raw(4))[0]
        if t == "double":
            return struct.unpack("<d", cur.raw(8))[0]
        if t == "bytes":
            return cur.zbytes()
        if t == "string":
            return cur.zstring()
        raise ValueError(f"unsupported avro primitive {t}")
    if isinstance(schema, list):  # union: long branch index first
        return _avro_datum(cur, schema[cur.zlong()])
    t = schema["type"]
    if t == "record":
        return {f["name"]: _avro_datum(cur, f["type"])
                for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = cur.zlong()
            if n == 0:
                return out
            if n < 0:  # block with byte size prefix
                cur.zlong()
                n = -n
            out.extend(_avro_datum(cur, schema["items"]) for _ in range(n))
    if t == "map":
        out = {}
        while True:
            n = cur.zlong()
            if n == 0:
                return out
            if n < 0:
                cur.zlong()
                n = -n
            for _ in range(n):
                k = cur.zstring()  # key before value (RHS evaluates first)
                out[k] = _avro_datum(cur, schema["values"])
    if t in ("int", "long", "string", "bytes", "boolean", "float", "double",
             "null"):
        return _avro_datum(cur, t)
    raise ValueError(f"unsupported avro type {t}")


def read_avro(path: str):
    """All records of an Avro object container file (null/deflate codec)."""
    buf = open(path, "rb").read()
    assert buf[:4] == b"Obj\x01", f"not an avro container: {path}"
    cur = _AvroCursor(buf, 4)
    meta = {}
    while True:
        n = cur.zlong()
        if n == 0:
            break
        if n < 0:
            cur.zlong()
            n = -n
        for _ in range(n):
            k = cur.zstring()  # key MUST be read before the value —
            meta[k] = cur.zbytes()  # an inlined RHS would evaluate first
    codec = meta.get("avro.codec", b"null").decode()
    schema = json.loads(meta["avro.schema"])
    sync = cur.raw(16)
    records = []
    while cur.off < len(buf):
        count = cur.zlong()
        size = cur.zlong()
        block = cur.raw(size)
        if codec == "deflate":
            import zlib
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec}")
        bcur = _AvroCursor(block)
        for _ in range(count):
            records.append(_avro_datum(bcur, schema))
        assert cur.raw(16) == sync, "avro sync mismatch"
    return records


# ---------------------------------------------------------------------------
# Delta Lake reader (PROTOCOL.md)
# ---------------------------------------------------------------------------

_COMMIT_RE = re.compile(r"^(\d{20})\.json$")
_CKPT_RE = re.compile(r"^(\d{20})\.checkpoint\.parquet$")
_CKPT_V2_RE = re.compile(r"^(\d{20})\.checkpoint\.([0-9a-fA-F-]{36})\.parquet$")


def _delta_cast_partition(v, typ):
    if v is None:
        return None
    if typ in ("long", "integer", "short", "byte"):
        return int(v)
    if typ == "double" or typ == "float":
        return float(v)
    if typ == "boolean":
        return v == "true"
    return v  # string, date kept lexical


def read_delta(table: str, row_ids: bool = False) -> pd.DataFrame:
    log = os.path.join(table, "_delta_log")
    commits, ckpts, v2ckpts = {}, {}, {}
    for f in os.listdir(log):
        m = _COMMIT_RE.match(f)
        if m:
            commits[int(m.group(1))] = os.path.join(log, f)
        m = _CKPT_RE.match(f)
        if m:
            ckpts[int(m.group(1))] = os.path.join(log, f)
        m = _CKPT_V2_RE.match(f)
        if m:
            v2ckpts[int(m.group(1))] = os.path.join(log, f)
    latest = max(list(commits) + list(ckpts) + list(v2ckpts))
    # honor _last_checkpoint when present (the documented fast path)
    lc = os.path.join(log, "_last_checkpoint")
    ckpt_v = None
    if os.path.exists(lc):
        ckpt_v = json.load(open(lc))["version"]
    elif ckpts or v2ckpts:
        ckpt_v = max(v for v in list(ckpts) + list(v2ckpts) if v <= latest)

    adds = {}       # path -> dict(partitionValues, deletionVector)
    meta = None

    def apply_add(path, pvals, dv, base_row_id=None):
        adds[path] = {"partitionValues": pvals or {}, "dv": dv,
                      "baseRowId": base_row_id}

    def apply_ckpt_row(row):
        nonlocal meta
        if row.get("metaData") and row["metaData"].get("schemaString"):
            meta = row["metaData"]
        a = row.get("add")
        if a and a.get("path"):
            pv = a.get("partitionValues")
            if isinstance(pv, list):  # pyarrow map -> [(k, v), ...]
                pv = dict(pv)
            apply_add(a["path"], pv, a.get("deletionVector"),
                      a.get("baseRowId"))

    if ckpt_v is not None and ckpt_v in v2ckpts:
        # PROTOCOL.md "V2 Spec Checkpoints": a uuid-named manifest
        # carries protocol/metaData (+ possibly inline actions) and
        # `sidecar` references; file actions live in _delta_log/_sidecars
        sidecars = []
        for row in pq.read_table(v2ckpts[ckpt_v]).to_pylist():
            apply_ckpt_row(row)
            sc = row.get("sidecar")
            if sc and sc.get("path"):
                sidecars.append(sc["path"])
        for s in sidecars:
            p = s if s.startswith("/") or "://" in s else \
                os.path.join(log, "_sidecars", s)
            for row in pq.read_table(p).to_pylist():
                apply_ckpt_row(row)
    elif ckpt_v is not None:
        for row in pq.read_table(ckpts[ckpt_v]).to_pylist():
            apply_ckpt_row(row)
    start = 0 if ckpt_v is None else ckpt_v + 1
    for v in range(start, latest + 1):
        if v not in commits:
            raise AssertionError(f"missing commit {v} above checkpoint")
        for line in open(commits[v]):
            line = line.strip()
            if not line:
                continue
            act = json.loads(line)
            if "metaData" in act:
                meta = act["metaData"]
            elif "add" in act:
                a = act["add"]
                apply_add(a["path"], a.get("partitionValues"),
                          a.get("deletionVector"), a.get("baseRowId"))
            elif "remove" in act:
                adds.pop(act["remove"]["path"], None)

    assert meta is not None, "no metaData action in log"
    schema = json.loads(meta["schemaString"])
    col_names = [f["name"] for f in schema["fields"]]
    col_types = {f["name"]: f["type"] for f in schema["fields"]}
    part_cols = meta.get("partitionColumns", [])
    # column mapping: parquet files and partitionValues carry PHYSICAL
    # names; the logical rename happens here, from the schema metadata
    mode = (meta.get("configuration") or {}) \
        .get("delta.columnMapping.mode", "none")
    phys_of = {}
    for f in schema["fields"]:
        md = f.get("metadata") or {}
        phys_of[f["name"]] = (
            md.get("delta.columnMapping.physicalName", f["name"])
            if mode != "none" else f["name"])

    con = duckdb.connect()
    # Row Tracking: files REWRITTEN by OPTIMIZE carry their ids in the
    # table's MATERIALIZED row-id column, which takes precedence over
    # the baseRowId + index derivation (PROTOCOL.md)
    mat_id = (meta.get("configuration") or {}).get(
        "delta.rowTracking.materializedRowIdColumnName")
    frames = []
    for path, info in sorted(adds.items()):
        full = os.path.join(table, path)
        df = con.execute(
            "SELECT *, file_row_number AS _frn FROM read_parquet(?,"
            " file_row_number=true)", [full]).fetchdf()
        dv = info["dv"]
        if dv:
            deleted = _delta_dv_rows(table, dv)
            df = df[~df["_frn"].isin(deleted)]
        if row_ids:
            base = info.get("baseRowId")
            derived = (df["_frn"] + base) if base is not None else None
            if mat_id and mat_id in df.columns and df[mat_id].notna().all():
                df["_row_id"] = df[mat_id].astype("int64")
            else:
                df["_row_id"] = derived
        df = df.drop(columns=["_frn"])
        df = df.rename(columns={p: l for l, p in phys_of.items() if p != l})
        for c in part_cols:
            pv = info["partitionValues"]
            df[c] = _delta_cast_partition(
                pv.get(phys_of[c], pv.get(c)), col_types[c])
        for c in col_names:
            if c not in df.columns:
                df[c] = None
        out_cols = col_names + (["_row_id"] if row_ids else [])
        frames.append(df[out_cols])
    out_cols = col_names + (["_row_id"] if row_ids else [])
    return pd.concat(frames, ignore_index=True) if frames else \
        pd.DataFrame(columns=out_cols)


def read_delta_cdf(table: str) -> pd.DataFrame:
    """Reconstruct the Change Data Feed (PROTOCOL.md "Change Data Files")
    from scratch: per commit, `cdc` actions are authoritative and point at
    `_change_data/` parquet carrying `_change_type`; a pure-append commit
    without them derives `insert` rows from its `add` actions. Emits the
    data columns plus `_change_type` and `_commit_version`."""
    log = os.path.join(table, "_delta_log")
    commits = {}
    for f in os.listdir(log):
        m = _COMMIT_RE.match(f)
        if m:
            commits[int(m.group(1))] = os.path.join(log, f)
    meta = None
    con = duckdb.connect()
    frames = []
    for v in sorted(commits):
        acts = [json.loads(l) for l in open(commits[v]) if l.strip()]
        for act in acts:
            if "metaData" in act:
                meta = act["metaData"]
        assert meta is not None, "no metaData before first data commit"
        schema = json.loads(meta["schemaString"])
        col_names = [f["name"] for f in schema["fields"]]
        col_types = {f["name"]: f["type"] for f in schema["fields"]}
        part_cols = meta.get("partitionColumns", [])
        mode = (meta.get("configuration") or {}) \
            .get("delta.columnMapping.mode", "none")
        phys_of = {f["name"]: ((f.get("metadata") or {})
                   .get("delta.columnMapping.physicalName", f["name"])
                   if mode != "none" else f["name"])
                   for f in schema["fields"]}
        cdc = [a["cdc"] for a in acts if "cdc" in a]
        adds = [a["add"] for a in acts
                if "add" in a and a["add"].get("dataChange", True)]
        removes = [a["remove"] for a in acts
                   if "remove" in a and a["remove"].get("dataChange", True)]

        def load(path, pvals, change_type=None):
            df = con.execute("SELECT * FROM read_parquet(?)",
                             [os.path.join(table, path)]).fetchdf()
            df = df.rename(
                columns={p: l for l, p in phys_of.items() if p != l})
            for c in part_cols:
                pv = pvals or {}
                df[c] = _delta_cast_partition(
                    pv.get(phys_of[c], pv.get(c)), col_types[c])
            if change_type is not None:
                df["_change_type"] = change_type
            df["_commit_version"] = v
            return df[col_names + ["_change_type", "_commit_version"]]

        if cdc:
            for c in cdc:
                frames.append(load(c["path"], c.get("partitionValues")))
        elif adds and not removes:
            for a in adds:
                frames.append(load(a["path"], a.get("partitionValues"),
                                   change_type="insert"))
        elif removes and not cdc:
            raise AssertionError(
                f"commit {v} removes files without cdc actions — "
                "feed not derivable here")
    return pd.concat(frames, ignore_index=True) if frames else \
        pd.DataFrame()


def _delta_dv_rows(table: str, dv: dict):
    st = dv["storageType"]
    if st == "i":
        payload = z85_decode(dv["pathOrInlineDv"])
    else:
        if st == "u":
            enc = dv["pathOrInlineDv"]
            prefix, z = enc[:-20], enc[-20:]
            raw = z85_decode(z)
            u = uuidlib.UUID(bytes=raw)
            name = f"deletion_vector_{u}.bin"
            path = os.path.join(table, prefix, name) if prefix \
                else os.path.join(table, name)
        else:  # 'p': absolute
            path = dv["pathOrInlineDv"]
        buf = open(path, "rb").read()
        off = dv.get("offset", 1) or 1
        (size,) = struct.unpack_from(">i", buf, off)
        payload = buf[off + 4:off + 4 + size]
        (crc,) = struct.unpack_from(">i", buf, off + 4 + size)
        import zlib as _z
        assert _z.crc32(payload) & 0x7FFFFFFF == crc & 0x7FFFFFFF, \
            "DV CRC mismatch"
    rows = roaring64_array_decode(payload)
    card = dv.get("cardinality", -1)
    assert card < 0 or len(rows) == card, \
        f"DV cardinality {card} != decoded {len(rows)}"
    return rows


# ---------------------------------------------------------------------------
# Iceberg reader (iceberg.apache.org/spec, v1/v2)
# ---------------------------------------------------------------------------

_ICE_PRIM = {"int": "int64", "long": "int64", "float": "float64",
             "double": "float64", "string": "object", "boolean": "bool"}


def _ice_latest_metadata(table: str) -> str:
    meta_dir = os.path.join(table, "metadata")
    hint = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint):
        v = int(open(hint).read().strip())
        p = os.path.join(meta_dir, f"v{v}.metadata.json")
        if os.path.exists(p):
            return p
    cands = glob.glob(os.path.join(meta_dir, "v*.metadata.json"))
    return max(cands, key=lambda p: int(
        re.search(r"v(\d+)\.metadata\.json$", p).group(1)))


def _localize(table: str, p: str) -> str:
    """Manifest/data paths are absolute qualified URIs; strip the scheme."""
    if p.startswith("file:"):
        p = re.sub(r"^file:(//)?", "", p)
    return p


def _parquet_field_ids(path: str):
    """column name -> parquet field id, via pyarrow's schema metadata."""
    schema = pq.read_schema(path)
    ids = {}
    for f in schema:
        fid = (f.metadata or {}).get(b"PARQUET:field_id")
        if fid is not None:
            ids[f.name] = int(fid)
    return ids


def read_iceberg(table: str, row_ids: bool = False) -> pd.DataFrame:
    meta = json.load(open(_ice_latest_metadata(table)))
    cur_schema_id = meta.get("current-schema-id", 0)
    schema = next(s for s in meta.get("schemas", [meta.get("schema")])
                  if s.get("schema-id", 0) == cur_schema_id)
    fields = schema["fields"]  # [{id, name, type, required}]
    id_to_name = {f["id"]: f["name"] for f in fields}
    col_names = [f["name"] for f in fields]
    col_types = {f["name"]: f["type"] for f in fields}
    props = meta.get("properties", {})
    name_mapping = None
    if "schema.name-mapping.default" in props:
        nm = json.loads(props["schema.name-mapping.default"])
        name_mapping = {}
        for entry in nm:
            for n in entry.get("names", []):
                name_mapping[n] = entry["field-id"]

    spec_id = meta.get("default-spec-id", 0)
    specs = meta.get("partition-specs")
    spec_fields = []
    if specs:
        spec = next((x for x in specs if x.get("spec-id", 0) == spec_id), None)
        if spec:
            spec_fields = [f["name"] for f in spec.get("fields", [])
                           if f.get("transform") == "identity"]
    elif meta.get("partition-spec"):
        spec_fields = [f["name"] for f in meta["partition-spec"]
                       if f.get("transform") == "identity"]

    snap_id = meta.get("current-snapshot-id")
    assert snap_id is not None and snap_id != -1, "no current snapshot"
    snap = next(s for s in meta["snapshots"] if s["snapshot-id"] == snap_id)
    manifests = read_avro(_localize(table, snap["manifest-list"]))

    data_files = []   # (path, sequence, partition tuple, first_row_id)
    pos_deletes = []  # (path of delete file, sequence)
    eq_deletes = []   # (path, sequence, [equality field ids])
    dv_blobs = []     # (puffin path, referenced data file, offset, length)
    for m in manifests:
        seq = m.get("sequence_number") or 0
        entries = read_avro(_localize(table, m["manifest_path"]))
        # v3 row lineage: a null entry first_row_id inherits from the
        # manifest list's first_row_id, advancing by record_count over
        # the manifest's null-first_row_id data files (spec "Row
        # Lineage" assignment walk)
        row_cursor = m.get("first_row_id")
        for e in entries:
            df_ = e["data_file"]
            content = df_.get("content", 0)
            path = df_["file_path"]
            fri = df_.get("first_row_id")
            if content == 0 and fri is None and row_cursor is not None:
                fri = row_cursor
                row_cursor += df_.get("record_count", 0)
            if e["status"] == 2:  # DELETED
                continue
            # spec manifest-entry field 3: an EXISTING entry moved into a
            # rewritten manifest carries its data sequence EXPLICITLY —
            # inheriting the new manifest's would re-order deletes
            eseq = e.get("sequence_number")
            if eseq is None:
                eseq = seq
            if content == 0:
                data_files.append((path, eseq, df_.get("partition") or {},
                                   fri))
            elif content == 1 and (
                    str(df_.get("file_format", "")).upper() == "PUFFIN"
                    or df_.get("referenced_data_file") is not None):
                # v3 deletion vector: one puffin blob per referenced file
                dv_blobs.append((path, df_["referenced_data_file"],
                                 int(df_["content_offset"]),
                                 int(df_["content_size_in_bytes"])))
            elif content == 1:
                pos_deletes.append((path, eseq))
            elif content == 2:
                eq_deletes.append((path, eseq, df_.get("equality_ids") or []))

    con = duckdb.connect()

    # position deletes: (data file path, row position) pairs
    pos_by_file = {}
    for path, seq in pos_deletes:
        pdf = con.execute("SELECT * FROM read_parquet(?)",
                          [_localize(table, path)]).fetchdf()
        fcol = next(c for c in pdf.columns if "file_path" in c)
        pcol = next(c for c in pdf.columns if c.endswith("pos"))
        for fp, pos in zip(pdf[fcol], pdf[pcol]):
            pos_by_file.setdefault(os.path.basename(str(fp)),
                                   set()).add(int(pos))

    # v3 deletion vectors: the blob framing is a 4-byte BE length of
    # (magic + vector), the D1D33964 magic, the keyed portable 64-bit
    # roaring vector, and a 4-byte BE CRC-32 of magic + vector
    # (iceberg spec "Deletion Vectors"); the vector itself is the same
    # serialization Delta DVs use, decoded by roaring64_array_decode
    for puffin, ref, off, ln in dv_blobs:
        buf = open(_localize(table, puffin), "rb").read()
        (dlen,) = struct.unpack_from(">i", buf, off)
        assert dlen + 8 == ln, f"DV blob framing mismatch in {puffin}@{off}"
        payload = buf[off + 4: off + 4 + dlen]
        (crc,) = struct.unpack_from(">I", buf, off + 4 + dlen)
        assert zlib.crc32(payload) & 0xFFFFFFFF == crc, "DV blob CRC mismatch"
        positions = roaring64_array_decode(payload, 0, magic=True)
        pos_by_file.setdefault(os.path.basename(str(ref)),
                               set()).update(positions)

    # equality deletes: value tuples + the sequence they were committed at
    eq_sets = []  # (field names tuple, set of value tuples, sequence)
    for path, seq, ids in eq_deletes:
        lp = _localize(table, path)
        edf = con.execute("SELECT * FROM read_parquet(?)", [lp]).fetchdf()
        fids = _parquet_field_ids(lp)
        names = []
        for fid in ids:
            col = next((c for c, i in fids.items() if i == fid), None)
            names.append(col if col else id_to_name[fid])
        vals = set(map(tuple, edf[names].itertuples(index=False, name=None)))
        key_names = tuple(id_to_name[fid] for fid in ids)
        eq_sets.append((key_names, vals, seq))

    frames = []
    for path, seq, ptuple, fri in sorted(data_files, key=lambda t: t[0]):
        lp = _localize(table, path)
        df = con.execute(
            "SELECT *, file_row_number AS _ifrn FROM read_parquet(?,"
            " file_row_number=true)", [lp]).fetchdf()
        fids = _parquet_field_ids(lp)
        # resolve file columns to CURRENT names: field ids first, then
        # the table's name mapping for id-less imported files
        rename = {}
        for c in df.columns:
            fid = fids.get(c)
            if fid is None and name_mapping is not None:
                fid = name_mapping.get(c)
            if fid is not None and fid in id_to_name:
                rename[c] = id_to_name[fid]
        df = df.rename(columns=rename)
        if row_ids:
            # _row_id = effective first_row_id + PHYSICAL row index;
            # DV/pos-delete filtering below must not shift it
            df["_row_id"] = (df["_ifrn"] + fri) if fri is not None else None
        df = df[[c for c in df.columns
                 if c in col_names or c in ("_ifrn", "_row_id")]]
        pos = pos_by_file.get(os.path.basename(_localize(table, path)))
        if pos:
            df = df[~df["_ifrn"].isin(pos)]
        df = df.drop(columns=["_ifrn"])
        for key_names, vals, dseq in eq_sets:
            if dseq > seq and all(k in df.columns for k in key_names):
                keys = list(key_names)
                mask = df[keys].apply(
                    lambda r: tuple(r) in vals, axis=1) if len(df) else \
                    pd.Series([], dtype=bool)
                df = df[~mask]
        for c in col_names:
            if c not in df.columns:
                # spec "Column Projection" rule 1: an identity partition
                # source absent from the file reads from the tuple —
                # registered hive-layout (Delta) files depend on this
                if c in spec_fields and ptuple.get(c) is not None:
                    df[c] = ptuple[c]
                else:
                    df[c] = None
        out_cols = col_names + (["_row_id"] if row_ids else [])
        frames.append(df[out_cols])
    out_cols = col_names + (["_row_id"] if row_ids else [])
    out = pd.concat(frames, ignore_index=True) if frames else \
        pd.DataFrame(columns=out_cols)
    # current-schema types (covers int->long promotion on old files)
    for c in col_names:
        want = _ICE_PRIM.get(col_types[c])
        if want and want != "object" and out[c].notna().all() and len(out):
            out[c] = out[c].astype(want)
    return out


# ---------------------------------------------------------------------------
# compare against the fixture's ground truth
# ---------------------------------------------------------------------------

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, got: pd.DataFrame, exp_dir: str):
    exp = pd.concat([pd.read_parquet(f)
                     for f in glob.glob(os.path.join(exp_dir, "*.parquet"))],
                    ignore_index=True)
    got, exp = canon(got), canon(exp)
    if list(got.columns) != list(exp.columns):
        return f"FAIL {name}: cols {list(got.columns)} vs {list(exp.columns)}"
    if len(got) != len(exp):
        return f"FAIL {name}: rows {len(got)} vs {len(exp)}"
    for c in exp.columns:
        try:
            g = got[c].astype(exp[c].dtype)
        except (TypeError, ValueError):
            g = got[c]
        ge, ee = g.reset_index(drop=True), exp[c].reset_index(drop=True)
        if ee.dtype.kind == "f":
            ok = ((ge.isna() & ee.isna()) | ((ge - ee).abs() < 1e-9)).all()
        else:
            ok = (ge.where(pd.notna(ge), None)
                  .eq(ee.where(pd.notna(ee), None)) |
                  (ge.isna() & ee.isna())).all()
        if not ok:
            return f"FAIL {name}: column {c} differs"
    return f"PASS {name}: {len(got)} rows"


def main():
    fix = sys.argv[1] if len(sys.argv) > 1 else "/tmp/extfix"
    names = sorted(d for d in os.listdir(fix)
                   if d != "expected" and os.path.isdir(os.path.join(fix, d)))
    fails = 0
    for name in names:
        table = os.path.join(fix, name)
        try:
            if name == "delta_cdf":
                got = read_delta_cdf(table)
            elif name == "delta_rowtrack":
                got = read_delta(table, row_ids=True)
            elif name == "iceberg_v3lineage":
                got = read_iceberg(table, row_ids=True)
            elif name.startswith("delta"):
                got = read_delta(table)
            else:
                got = read_iceberg(table)
            msg = compare(name, got, os.path.join(fix, "expected", name))
        except Exception as e:
            msg = f"FAIL {name}: {type(e).__name__}: {e}"
        print(msg)
        if msg.startswith("FAIL"):
            fails += 1
    print(f"{len(names) - fails}/{len(names)} external-reader checks pass")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
