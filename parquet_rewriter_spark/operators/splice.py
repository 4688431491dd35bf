"""Row-group-granularity splice for SMALL merges — the driver fast path.

The reference's headline trick is appending untouched row groups to the
output file as raw bytes and rewriting only the row groups a mutation
touches (``writer.appendRowGroup(raw)``, ParquetRewriter.java:312-322).
Our distributed merge works at part-file granularity: a 1-row upsert
rewrites a whole part-file through a Spark job (shuffle + task launch ≈
a fixed ~1 s at small scale). This module recovers the reference's
granularity for the case that actually hits it — a small mutation batch
against a few disjoint files:

- mutations are collected to the driver (bounded by
  ``MAX_SPLICE_MUTATIONS``; beyond that the distributed path is the
  right tool anyway);
- per dirty file, ONLY the row groups whose footer key range contains a
  mutation key are merged (in pandas); clean row groups are copied
  column-chunk-wise with their original row-group boundaries preserved;
- no Spark job, no shuffle, no task scheduling — wall time tracks the
  dirty ROW GROUP size plus a sequential columnar copy of the file.

Clean row groups are copied as RAW BYTES — the reference's actual trick
(``writer.appendRowGroup(rawStream, blockMeta, false)``,
ParquetRewriter.java:317) — via the driver JVM's parquet-java through
the py4j gateway (``spark._jvm...ParquetFileWriter.appendRowGroup``):
rewritten row groups are encoded once into a small pyarrow "patch"
file, then the output is assembled by appending raw row groups from the
source file (clean) and the patch file (dirty) under the source's
parquet schema and key-value metadata. Clean bytes are never decoded;
the copied ranges are byte-identical (asserted in test_merge.py).
Guard: the patch file's parquet schema body must equal the source's
(pyarrow and parquet-mr agree for the primitive/string/timestamp types
Spark writes; exotic types like small-precision decimals differ) — any
mismatch, or any JVM surprise, falls back to the pyarrow
decode-re-encode writer below, which preserves content and row-group
boundaries but not bytes.

The caller (merge_into_table) guards every precondition and falls back
to the distributed path whenever one fails:
- total mutations ≤ MAX_SPLICE_MUTATIONS;
- dirty-file key ranges pairwise disjoint (overlapping ranges need the
  cross-file dedup only the distributed merge does);
- no duplicate keys inside the mutation batch (its deterministic
  tiebreak is a Spark expression we do not replicate driver-side).
"""

from __future__ import annotations

import os
import uuid
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from parquet_rewriter_spark.stats import _footer_stats

if TYPE_CHECKING:
    from parquet_rewriter_spark.table import ManifestEntry, SortedTable

MAX_SPLICE_MUTATIONS = 10_000
MAX_SPLICE_FILES = 8

OP_COLUMN = "op"
OP_DELETE = "DELETE"
OP_UPSERT = "UPSERT"


def splice_preconditions(dirty: list, mut_count: int) -> bool:
    """Cheap driver-side checks (range disjointness + size caps)."""
    if not dirty or len(dirty) > MAX_SPLICE_FILES or mut_count > MAX_SPLICE_MUTATIONS:
        return False
    spans = sorted((e.key_min, e.key_max) for e in dirty)
    return all(spans[i][1] < spans[i + 1][0] for i in range(len(spans) - 1))


def _rg_key_bounds(md, key: str) -> tuple[list, list]:
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[key]
    mins, maxs = [], []
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            raise ValueError("missing row-group key statistics")
        mins.append(st.min)
        maxs.append(st.max)
    return mins, maxs


def _apply_pdf(base: pd.DataFrame, muts: pd.DataFrame, key: str) -> pd.DataFrame:
    """Driver-side analog of apply_mutations for one row group's rows.
    Assumes no duplicate keys within ``muts`` (precondition-checked)."""
    dels = muts.loc[muts[OP_COLUMN] == OP_DELETE, key]
    ups = muts.loc[muts[OP_COLUMN] == OP_UPSERT].drop(columns=[OP_COLUMN])
    out = base[~base[key].isin(set(dels)) & ~base[key].isin(set(ups[key]))]
    frames = [f for f in (out, ups) if len(f)]
    out = pd.concat(frames, ignore_index=True) if frames else out
    return out.sort_values(key, kind="mergesort").reset_index(drop=True)


def _schema_body(msg_type) -> str:
    """Parquet MessageType rendered WITHOUT the root message name —
    Spark names the root ``spark_schema``, pyarrow ``schema``; the
    fields are what raw row-group interchange requires to agree."""
    s = msg_type.toString()
    return s[s.index("{"):]


def _raw_assemble(spark, src: str, patch: str | None, out_tmp: str,
                  plan: list[tuple[str, int]]) -> None:
    """Assemble ``out_tmp`` by appending RAW row groups from ``src``
    ('src', i) and ``patch`` ('patch', i) in ``plan`` order, using
    parquet-java on the driver JVM (py4j). The output keeps the source
    file's parquet schema and key-value metadata (Spark's row-metadata
    rides along). Raises on any mismatch; the caller falls back."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    HIn = jvm.org.apache.parquet.hadoop.util.HadoopInputFile
    HOut = jvm.org.apache.parquet.hadoop.util.HadoopOutputFile
    PFR = jvm.org.apache.parquet.hadoop.ParquetFileReader
    PFW = jvm.org.apache.parquet.hadoop.ParquetFileWriter

    fin = HIn.fromPath(Path(src), hconf)
    rin = PFR.open(fin)
    try:
        src_footer = rin.getFooter()
        schema = src_footer.getFileMetaData().getSchema()
        pin = rp = patch_footer = None
        if patch is not None:
            pin = HIn.fromPath(Path(patch), hconf)
            rp = PFR.open(pin)
            patch_footer = rp.getFooter()
            if _schema_body(
                patch_footer.getFileMetaData().getSchema()
            ) != _schema_body(schema):
                raise ValueError("patch/source parquet schema mismatch")
        writer = PFW(HOut.fromPath(Path(out_tmp), hconf), schema,
                     PFW.Mode.valueOf("OVERWRITE"), 134217728, 8388608)
        writer.start()
        src_stream = fin.newStream()
        patch_stream = pin.newStream() if pin is not None else None
        try:
            for which, idx in plan:
                if which == "src":
                    writer.appendRowGroup(
                        src_stream, src_footer.getBlocks().get(idx), False
                    )
                else:
                    writer.appendRowGroup(
                        patch_stream, patch_footer.getBlocks().get(idx), False
                    )
        finally:
            src_stream.close()
            if patch_stream is not None:
                patch_stream.close()
        writer.end(src_footer.getFileMetaData().getKeyValueMetaData())
    finally:
        rin.close()
        if patch is not None and rp is not None:
            rp.close()


def splice_merge(
    table: "SortedTable",
    dirty: list,
    mut_pdf: pd.DataFrame,
    key: str,
) -> tuple[list, dict]:
    """Apply ``mut_pdf`` to ``dirty`` files at row-group granularity.

    Returns (new_manifest_entries, metrics). Raises on any unexpected
    condition — the caller falls back to the distributed merge.
    """
    if OP_COLUMN not in mut_pdf.columns:
        mut_pdf = mut_pdf.assign(**{OP_COLUMN: OP_UPSERT})
    bad_ops = set(mut_pdf[OP_COLUMN].unique()) - {OP_UPSERT, OP_DELETE}
    if bad_ops:  # same contract as apply_mutations' in-plan raise_error
        raise ValueError(f"invalid mutation op values: {sorted(bad_ops)}")
    if mut_pdf[key].duplicated().any():
        raise ValueError("duplicate mutation keys — distributed tiebreak required")
    stats_cols = tuple(table.manifest().stats_cols)

    # assign each mutation to the (unique, ranges disjoint) dirty file
    # containing its key; the rest are pure inserts
    keys = mut_pdf[key].to_numpy()
    assigned = np.full(len(mut_pdf), -1, dtype=np.int64)
    for i, e in enumerate(dirty):
        inside = (keys >= e.key_min) & (keys <= e.key_max)
        assigned[inside] = i

    entries: list = []
    rgs_rewritten = rgs_copied = files_raw = 0
    mut_data_cols = {c for c in mut_pdf.columns if c != OP_COLUMN}
    for i, e in enumerate(dirty):
        src = os.path.join(table.path, e.name)
        pf = pq.ParquetFile(src)
        # the splice writes with the FILE's physical schema — if the
        # table evolved (add/drop column) past what this file carries,
        # copying row groups verbatim would silently drop or misalign
        # the evolved columns. Bail to the distributed merge, which
        # reads through the manifest-pinned schema.
        if set(pf.schema_arrow.names) != mut_data_cols:
            raise ValueError(
                f"schema drift between {e.name} and mutation batch — "
                "distributed merge required"
            )
        rg_mins, rg_maxs = _rg_key_bounds(pf.metadata, key)
        fmuts = mut_pdf.iloc[np.nonzero(assigned == i)[0]]
        fkeys = fmuts[key].to_numpy()
        # target row group: first rg whose max covers the key (gap keys
        # merge into the next rg; keys past the last max cannot occur —
        # they would be outside the file's range)
        rg_of = np.minimum(
            np.searchsorted(np.asarray(rg_maxs), fkeys, side="left"),
            pf.metadata.num_row_groups - 1,
        )
        new_name = f"part-{uuid.uuid4().hex}.parquet"
        tmp = os.path.join(table.path, f"_splice-{new_name}")
        # Plan the output's row-group sequence and materialize ONLY the
        # rewritten groups (in pandas). Clean groups are never decoded
        # on the raw path below.
        plan: list[tuple[str, int]] = []
        patch_frames: list[pd.DataFrame] = []
        for rg in range(pf.metadata.num_row_groups):
            hit = rg_of == rg
            if not hit.any():
                plan.append(("src", rg))
                continue
            base = pf.read_row_group(rg).to_pandas()
            merged = _apply_pdf(base, fmuts.iloc[np.nonzero(hit)[0]], key)
            if len(merged):
                plan.append(("patch", len(patch_frames)))
                patch_frames.append(merged)
            rgs_rewritten += 1
        rgs_copied += sum(1 for which, _ in plan if which == "src")

        patch_path = tmp + ".patch"
        try:
            if patch_frames:
                with pq.ParquetWriter(patch_path, pf.schema_arrow) as pw:
                    for mdf in patch_frames:
                        t = pa.Table.from_pandas(
                            mdf, schema=pf.schema_arrow, preserve_index=False
                        )
                        pw.write_table(t, row_group_size=max(1, t.num_rows))
            try:
                _raw_assemble(
                    table.spark, src,
                    patch_path if patch_frames else None, tmp, plan,
                )
                files_raw += 1
            except Exception:  # noqa: BLE001 - schema/JVM surprise
                # decode-re-encode fallback: content-preserving, same
                # row-group boundaries, but clean bytes are re-encoded
                with pq.ParquetWriter(tmp, pf.schema_arrow) as writer:
                    for which, idx in plan:
                        if which == "src":
                            t = pf.read_row_group(idx)
                        else:
                            t = pa.Table.from_pandas(
                                patch_frames[idx], schema=pf.schema_arrow,
                                preserve_index=False,
                            )
                        writer.write_table(t, row_group_size=max(1, t.num_rows))
        finally:
            if os.path.exists(patch_path):
                os.remove(patch_path)
        os.replace(tmp, os.path.join(table.path, new_name))
        st = _footer_stats(os.path.join(table.path, new_name), key, stats_cols)
        if st.num_rows == 0:
            os.remove(os.path.join(table.path, new_name))
        else:
            from parquet_rewriter_spark.table import ManifestEntry

            entries.append(
                ManifestEntry(
                    name=new_name,
                    rows=st.num_rows,
                    bytes=st.num_bytes,
                    key_min=st.key_min,
                    key_max=st.key_max,
                    col_stats={c: list(mm) for c, mm in st.col_stats.items()},
                )
            )

    # pure inserts (keys outside every dirty range): one new sorted file
    ins = mut_pdf.iloc[np.nonzero(assigned == -1)[0]]
    ins = ins.loc[ins[OP_COLUMN] == OP_UPSERT].drop(columns=[OP_COLUMN])
    if len(ins):
        schema = pq.ParquetFile(os.path.join(table.path, dirty[0].name)).schema_arrow
        ins = ins.sort_values(key, kind="mergesort").reset_index(drop=True)
        new_name = f"part-{uuid.uuid4().hex}.parquet"
        tmp = os.path.join(table.path, f"_splice-{new_name}")
        pq.write_table(pa.Table.from_pandas(ins, schema=schema, preserve_index=False), tmp)
        os.replace(tmp, os.path.join(table.path, new_name))
        st = _footer_stats(os.path.join(table.path, new_name), key, stats_cols)
        from parquet_rewriter_spark.table import ManifestEntry

        entries.append(
            ManifestEntry(
                name=new_name,
                rows=st.num_rows,
                bytes=st.num_bytes,
                key_min=st.key_min,
                key_max=st.key_max,
                col_stats={c: list(mm) for c, mm in st.col_stats.items()},
            )
        )

    return entries, {
        "rgs_rewritten": rgs_rewritten,
        "rgs_copied": rgs_copied,
        "files_raw_appended": files_raw,
    }
