"""warc_records DataFrame → CDX DataFrame: the reference's ``make_cdx`` loop
(cdx_writer.py:638-712) as a declarative Spark plan.

Plan shape (deliberately ordered — Catalyst won't reorder around opaque
pandas UDFs, so cheap native filters run first, SURVEY.md §4 item 2):

1. native filters: record-type/content-type (F1), negative length (F2)
2. ONE Arrow pandas UDF computing the byte-level fields that need Python
   (urlkey/original-url/mime/status/checksum/meta — shares the HTTP header
   split across all six, mirroring the reference's per-record precompute,
   cdx_writer.py:677-681)
3. native column exprs: date (P3), sentinels, file name, S/V
4. exclude filter (F3): `exists()` over a broadcast literal array for small
   lists (no shuffle, whole-stage codegen), broadcast LEFT ANTI join for
   big lists
5. optional CDX line serialization: concat_ws + rstrip

At 100 TB the only shuffle in this pipeline is the final (optional) sort —
everything else is embarrassingly parallel per archive file.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

__all__ = ["cdx_fields", "cdx_lines", "date_expr", "FIELD_COLUMNS"]

# CDX field letter -> column name (Spark resolves identifiers
# case-insensitively, so the reference's m/M and s/S letters cannot be
# column names directly)
FIELD_COLUMNS = {
    "N": "urlkey", "b": "cdx_date", "a": "original_url", "m": "mime",
    "s": "status_code", "k": "checksum", "r": "redirect",
    "M": "meta_flags", "S": "rec_size", "V": "rec_offset", "g": "warc_name",
}

_PY_FIELDS_SCHEMA = T.StructType([
    T.StructField("urlkey", T.StringType()),
    T.StructField("original_url", T.StringType()),
    T.StructField("mime", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("checksum", T.StringType()),
    T.StructField("meta_flags", T.StringType()),
])


def date_expr(col: Column) -> Column:
    """Field b (reference cdx_writer.py:352-376) as a pure Column expr:
    12/14/16/18-digit passthrough/truncate/pad, hex→'-', else ISO-8601."""
    digits = col.rlike("^[0-9]+$")
    return (
        F.when(digits & (F.length(col) == 14), col)
        .when(digits & F.length(col).isin(16, 18), F.substring(col, 1, 14))
        .when(digits & (F.length(col) == 12), F.concat(col, F.lit("00")))
        .when(col.rlike("^[a-f0-9]+$"), F.lit("-"))
        .otherwise(F.coalesce(
            F.date_format(
                F.to_timestamp(col, "yyyy-MM-dd'T'HH:mm:ss'Z'"),
                "yyyyMMddHHmmss"),
            F.lit("-")))
    )


def _make_py_fields_udf(screenshot_mode: bool = False):
    """Factory for the vectorized (Arrow-batched) byte-level CDX field UDF.
    One batch in, one struct-column batch out; regexes are compiled once per
    executor at kernel-module import.  ``screenshot_mode`` mirrors the
    reference's --screenshot-mode flag (cdx_writer.py:285-286,345-348,
    447-448,613-615)."""
    def kernel(record_type: pd.Series, url_raw: pd.Series,
               content_type: pd.Series, payload: pd.Series,
               content_length_hdr: pd.Series, payload_digest: pd.Series,
               sfps: pd.Series, filename: pd.Series) -> pd.DataFrame:
        from cdx_writer_spark.kernels import fields as K
        from cdx_writer_spark.kernels.warcrec import Record

        out = {k: [] for k in ("urlkey", "original_url", "mime", "status",
                               "checksum", "meta_flags")}
        for rt, url, ct, pl, clen, pdg, sf, fn in zip(
                record_type, url_raw, content_type, payload,
                content_length_hdr, payload_digest, sfps, filename):
            headers = {}
            if pdg is not None:
                headers["warc-payload-digest"] = pdg
            if sf is not None:
                headers["warc-simple-form-province-status"] = sf
            rec = Record(
                filename=fn, record_idx=0, offset=0, compressed_size=None,
                record_type=rt,
                url=bytes(url) if url is not None else None,
                date_raw=None,
                content_type=bytes(ct) if ct is not None else None,
                content_length_hdr=int(clen) if pd.notna(clen) else None,
                payload=bytes(pl) if pl is not None else b"",
                headers=headers,
            )
            http_headers, content = K.parse_headers_and_content(
                rec, screenshot_mode)
            mime = K.get_mime_type(rec, http_headers, screenshot_mode)
            meta = K.parse_meta_tags(rec, mime, content)
            out["urlkey"].append(K.get_massaged_url(rec, fn, screenshot_mode))
            out["original_url"].append(
                K.get_original_url(rec, fn, screenshot_mode))
            out["mime"].append(mime)
            out["status"].append(K.get_response_code(rec))
            out["checksum"].append(K.get_new_style_checksum(rec, content))
            out["meta_flags"].append(
                K.get_aif_meta_tags(rec, http_headers, meta))
        return pd.DataFrame(out)
    return F.pandas_udf(_PY_FIELDS_SCHEMA)(kernel)


_py_fields_udf = _make_py_fields_udf(False)


def cdx_fields(records: DataFrame, *, all_records: bool = False,
               screenshot_mode: bool = False,
               excludes: list[str] | DataFrame | None = None,
               keep_excluded_flag: bool = False) -> DataFrame:
    """Project the warc_records envelope to the 11 CDX columns.

    ``excludes``: list of SURT prefixes (small → broadcast literal array,
    JVM-side `exists`) or a DataFrame with column ``prefix`` (big → broadcast
    left-anti join).  With ``keep_excluded_flag`` the excluded rows are kept
    with an ``excluded`` boolean (for stats parity, reference
    cdx_writer.py:673-675)."""
    df = records
    if screenshot_mode:
        # screenshot WARCs keep only metadata records (cdx_writer.py:660-662)
        df = df.filter(F.col("record_type") == "metadata")
    elif not all_records:
        # F1 (reference cdx_writer.py:643-646,660-664)
        df = df.filter(
            F.col("record_type").isin("response", "revisit")
            & (F.col("content_type").isNull()
               | (F.col("content_type") != F.lit(b"text/dns"))))
    # F2: negative declared Content-Length (cdx_writer.py:666-670)
    df = df.filter(F.col("content_length_hdr").isNull()
                   | (F.col("content_length_hdr") >= 0))

    udf = (_make_py_fields_udf(True) if screenshot_mode else _py_fields_udf)
    df = df.withColumn("_py", udf(
        "record_type", "url_raw", "content_type", "payload",
        "content_length_hdr", "payload_digest", "sfps", "filename"))

    df = df.select(
        F.col("_py.urlkey").alias("urlkey"),
        date_expr(F.col("date_raw")).alias("cdx_date"),
        F.col("_py.original_url").alias("original_url"),
        F.col("_py.mime").alias("mime"),
        F.col("_py.status").alias("status_code"),
        F.col("_py.checksum").alias("checksum"),
        F.lit("-").alias("redirect"),
        F.col("_py.meta_flags").alias("meta_flags"),
        F.coalesce(F.col("compressed_size").cast("string"), F.lit("-")).alias("rec_size"),
        F.col("offset").cast("string").alias("rec_offset"),
        F.col("filename").alias("warc_name"),
        F.col("record_idx"),
    )

    if excludes is not None:
        if isinstance(excludes, DataFrame):
            # big exclude lists: broadcast LEFT ANTI prefix join (F3)
            cond = F.expr("startswith(urlkey, prefix)")
            if keep_excluded_flag:
                hit = (excludes.withColumnRenamed("prefix", "_pfx")
                       .withColumn("_hit", F.lit(True)))
                df = (df.join(F.broadcast(hit),
                              F.expr("startswith(urlkey, _pfx)"), "left")
                      .withColumn("excluded", F.coalesce("_hit", F.lit(False)))
                      .drop("_pfx", "_hit"))
            else:
                df = df.join(F.broadcast(excludes), cond, "left_anti")
        elif len(excludes) > 0:
            # small lists: JVM-side exists() over a literal array — no join,
            # no shuffle, stays inside whole-stage codegen
            arr = F.array(*[F.lit(p) for p in excludes])
            flag = F.exists(arr, lambda p: F.col("urlkey").startswith(p))
            if keep_excluded_flag:
                df = df.withColumn("excluded", flag)
            else:
                df = df.filter(~flag)
        elif keep_excluded_flag:
            df = df.withColumn("excluded", F.lit(False))
    elif keep_excluded_flag:
        df = df.withColumn("excluded", F.lit(False))
    return df


def cdx_lines(fields_df: DataFrame, fmt: str = "N b a m s k r M S V g",
              sort: bool = False) -> DataFrame:
    """Serialize to one-line-per-record (reference cdx_writer.py:683-699).
    ``sort=True`` produces the CDX convention (urlkey, date) global order via
    a range partition — the only shuffle in the pipeline."""
    cols = [FIELD_COLUMNS[f] for f in fmt.split()]
    keep = [c for c in ("urlkey", "cdx_date") if c in cols]
    out = fields_df.select(
        F.rtrim(F.concat_ws(" ", *[F.col(c) for c in cols])).alias("cdx_line"),
        *[F.col(c) for c in keep])
    if sort and keep:
        out = (out.repartitionByRange(*keep).sortWithinPartitions(*keep))
    return out.select("cdx_line")
