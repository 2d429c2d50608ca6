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

# ---------------------------------------------------------------------------
# JVM-side kernels (whole-stage codegen, zero python transfer)
# ---------------------------------------------------------------------------

_ALPHA32 = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
META_PARSE_LIMIT = 5 * 1024 * 1024

# DataFrame exclude lists above this row count leave the broadcast
# nested-loop prefix join (O(records x prefixes) compute) for the
# range-partitioned ordered merge in operators/exclude.py
BNLJ_MAX_PREFIXES = 1000


def _b32_of_sha1_hex(hex_col: Column) -> Column:
    """base32(unhex(sha1_hex)) as pure Column arithmetic: 160 bits = eight
    20-bit groups (5 hex chars) -> four 5-bit alphabet indices each.  Python
    equivalent: base64.b32encode(hashlib.sha1(x).digest()) — no padding since
    160 % 40 == 0 (reference cdx_writer.py:399-425 digest format)."""
    alpha = F.array(*[F.lit(c) for c in _ALPHA32])
    chars = []
    for i in range(8):
        v = F.conv(F.substring(hex_col, 1 + 5 * i, 5), 16, 10).cast("int")
        for shift in (15, 10, 5, 0):
            idx = F.shiftright(v, shift).bitwiseAND(F.lit(31))
            chars.append(F.element_at(alpha, idx + F.lit(1)))
    return F.concat(*chars)


def sha1_b32_expr(latin1_str: Column) -> Column:
    """sha1-base32 content digest of a latin-1-decoded byte string, fully
    JVM-side (F.sha1 is native; base32 is expression arithmetic)."""
    return _b32_of_sha1_hex(F.sha1(F.encode(latin1_str, "ISO-8859-1")))


def sha1_b32_binary_expr(payload: Column) -> Column:
    """sha1-base32 of a BINARY column, null-safe JVM-side (the crawl parse
    stage's checksum — equals functions.udfs.sha1_b32 byte-for-byte,
    pinned by tests/test_frontier.py).  The null guard matters: conv()
    over the null hex propagates as an all-'7' string, not NULL."""
    return F.when(payload.isNull(), F.lit(None).cast("string")) \
        .otherwise(_b32_of_sha1_hex(F.sha1(payload)))


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


_PY_URL_SCHEMA = T.StructType([
    T.StructField("urlkey", T.StringType()),
    T.StructField("original_url", T.StringType()),
    T.StructField("meta_flags", T.StringType()),
    T.StructField("checksum_fab", T.StringType()),
])


@F.pandas_udf(_PY_URL_SCHEMA)
def _py_url_meta_udf(record_type: pd.Series, url_raw: pd.Series,
                     filename: pd.Series, meta_slice: pd.Series,
                     x_robots: pd.Series, sfps: pd.Series,
                     fab_hex: pd.Series) -> pd.DataFrame:
    """The slim python side of the hot path: SURT/chardet url fields, the
    meta-robots scan, and hex->base32 of the JVM-computed sha1.  Everything
    byte-heavy (header/body split, sha1, status, mime) stays JVM-side —
    this UDF receives only url bytes, a bounded html-head slice (already
    NULL for pages with no <meta> tag at all — the JVM gate), and a
    40-char digest, ~10x less Arrow transfer than shipping payloads.

    Per-row work is inlined from kernels.fields get_massaged_url /
    get_original_url (same dispatch, minus a dataclass construction per
    row — measured ~1us/row across 10^7-row index runs), and the
    meta-flag assembly for sliceless rows is memoized on the raw
    (x-robots, sfps) header pair, which is near-constant per crawl."""
    import base64

    from cdx_writer_spark.kernels import fields as K
    from cdx_writer_spark.kernels.encdetect import to_unicode_like_reference
    from cdx_writer_spark.kernels.surt import surt

    fake = K.FAKE_BUILD_VERSION
    flag_cache: dict = {}
    urlkeys, origs, flags, fabs = [], [], [], []
    for rt, url, fn, ms, xr, sf, fh in zip(record_type, url_raw, filename,
                                           meta_slice, x_robots, sfps,
                                           fab_hex):
        if rt == "warcinfo":
            w = "warcinfo:/%s/%s" % (fn, fake)
            urlkeys.append(w)
            origs.append(w)
        else:
            b = bytes(url) if url is not None else b""
            orig = (to_unicode_like_reference(b)
                    .replace("\r", "%0D").replace("\n", "%0A")
                    .replace("\x0c", "%0C").replace("\x00", "%00"))
            origs.append(orig)
            try:
                urlkeys.append(surt(b))
            except Exception:   # bare fallback mirrors cdx_writer.py:290
                urlkeys.append(orig)
        if ms is not None:
            flags.append(K.aif_flags(K.meta_tags_from_html(bytes(ms)),
                                     xr, sf))
        else:
            ck = (xr, sf)
            v = flag_cache.get(ck)
            if v is None:
                v = K.aif_flags(None, xr, sf)
                if len(flag_cache) < 4096:
                    flag_cache[ck] = v
            flags.append(v)
        fabs.append(base64.b32encode(bytes.fromhex(fh)).decode("ascii")
                    if fh is not None else None)
    return pd.DataFrame({"urlkey": urlkeys, "original_url": origs,
                         "meta_flags": flags, "checksum_fab": fabs})


def _jvm_fields(df: DataFrame) -> DataFrame:
    """Byte-level CDX kernels as Column expressions (P5/P6/P12/P15 plus the
    header extraction for P4/P7) — the reference semantics of
    cdx_writer.py:399-425,429-457,585-620,105-114 with zero python transfer.

    The payload is viewed through a lossless latin-1 decode so string
    functions (regexp, substring, sha1-over-encode) operate on exact byte
    positions; char i == byte i."""
    rt = F.col("record_type")
    df = df.withColumn("_pay", F.decode(F.col("payload"), "ISO-8859-1"))
    pay = F.col("_pay")
    df = df.withColumn(
        "_is_http", (rt == "response") & pay.startswith("HTTP"))
    is_http = F.col("_is_http")
    # P15 split on the FIRST \r?\n\r?\n (python _CRLF_SPLIT.split(payload, 1)).
    # Any match of \r?\n\r?\n starts with one of exactly four literals, so
    # the leftmost match position is the min of four intrinsic indexOf
    # scans — ~4x faster than java.util.regex over the payload.  The
    # "\r\n\r\n" scan (early-terminating at the real header/body split for
    # well-formed HTTP) BOUNDS the other three: any leftmost variant match
    # starts at or before it, so they scan a header-sized prefix instead of
    # re-walking the whole payload.  None of the four runs for non-HTTP rows.
    pos4 = F.nullif(F.locate("\r\n\r\n", pay), F.lit(0))
    head4 = F.when(pos4.isNotNull(),
                   pay.substr(F.lit(1), pos4 + 1)).otherwise(pay)
    locs = [F.nullif(F.locate(lit, head4), F.lit(0))
            for lit in ("\n\n", "\n\r\n", "\r\n\n")]
    df = df.withColumn(
        "_pos",
        F.when(is_http, F.coalesce(F.least(pos4, *locs), F.lit(0))))
    pos = F.col("_pos")
    # greedy match length at _pos (python regex prefers the longest here)
    s4 = pay.substr(pos, F.lit(4))
    sep_len = (F.when(s4.startswith("\r\n\r\n"), F.lit(4))
               .when(s4.startswith("\r\n\n") | s4.startswith("\n\r\n"),
                     F.lit(3))
               .otherwise(F.lit(2)))
    hdrs = (F.when(is_http & (pos > 0), pay.substr(F.lit(1), pos - 1))
            .when(is_http, pay))
    df = (df.withColumn("_hdrs", hdrs)
            .withColumn("_sep_len", sep_len)
            .withColumn("_has_body", F.coalesce(is_http & (pos > 0),
                                                F.lit(False))))
    sep_len = F.col("_sep_len")
    has_body = F.col("_has_body")
    # 1-based char offset of the body inside _pay (== byte offset inside
    # payload: the header region is ASCII wherever a split was found)
    cstart = pos + sep_len

    # P18 is_response: ^application/http;\s*msgtype=response$ case-insens.
    df = df.withColumn(
        "_is_resp_ct",
        F.decode(F.col("content_type"), "ISO-8859-1")
        .rlike(r"(?i)^application/http;\s*msgtype=response$"))
    is_resp_ct = F.col("_is_resp_ct")

    # P5 status: anchored HTTP(/d.d)? (ddd).  The anchored match can only
    # span the first ~20 chars, so scan a 64-char prefix — java regex
    # find() otherwise retries the dead anchor at every payload position.
    status = F.when(
        rt == "response",
        F.coalesce(
            F.nullif(F.regexp_extract(
                F.col("_pay").substr(F.lit(1), F.lit(64)),
                r"^HTTP(?:/\d\.\d)? (\d+)", 1), F.lit("")),
            F.lit("-"))
    ).otherwise(F.lit("-"))

    # P12 first matching header line (python: pat.match per splitlines line)
    def header(name: str) -> Column:
        return F.nullif(F.regexp_extract(
            F.col("_hdrs"),
            r"(?im)^" + name + r":[ \t\x0B\f]*([^\r\n]+)", 1), F.lit(""))

    # P4 mime — staged columns so each regexp runs ONCE per row:
    # CollapseProject refuses to inline non-cheap exprs referenced more than
    # once, keeping the generated code linear instead of the ~12x textual
    # expansion a single nested CASE tree produces.
    strip_re = r"^[ \t\n\r\x0B\f]+|[ \t\n\r\x0B\f]+$"
    df = df.withColumn("_ct_hdr", header("content-type"))
    df = df.withColumn(
        "_ct_stripped", F.regexp_replace(F.col("_ct_hdr"), strip_re, ""))
    df = df.withColumn(
        "_pre_semi_m", F.regexp_extract(F.col("_ct_stripped"), r"^(.+?);", 1))
    pre_semi = (F.when(F.col("_pre_semi_m") != "", F.col("_pre_semi_m"))
                .otherwise(F.col("_ct_stripped")))
    df = df.withColumn("_pre_semi", pre_semi)
    mime_http = (
        F.when(F.col("_ct_hdr").isNull() | (F.col("_ct_stripped") == ""),
               F.lit("unk"))
        .when(F.col("_pre_semi").rlike(r"^[a-z0-9\-\.\+/]+$"),
              F.col("_pre_semi"))
        .otherwise(F.lit("unk")))
    ct_raw = F.decode(F.col("content_type"), "ISO-8859-1")
    df = df.withColumn(
        "_ct_replaced", F.replace(ct_raw, F.lit("no-type"), F.lit("unk")))
    mime_resp_other = (
        F.when(F.col("content_type").isNull(), F.lit("unk"))
        .when(F.col("_ct_replaced").rlike(r"[^\x00-\x7F]"), F.lit("unk"))
        .otherwise(F.col("_ct_replaced")))
    mime = (F.when((rt == "response") & is_resp_ct, mime_http)
            .when(rt == "response", mime_resp_other)
            .when(rt == "warcinfo", F.lit("warc-info"))
            .otherwise(F.concat(
                F.lit("warc/"),
                F.regexp_replace(rt, r"[^\x00-\x7F]", "?"))))
    df = df.withColumn("_mime", mime)

    # P6 checksum: header digest else fabricated base32(sha1(body)).
    # The sha1 runs JVM-side (native, no payload transfer); the cheap
    # hex->base32 of the 40-char digest happens in the python UDF where
    # base64.b32encode is a C call (a pure-expression base32 costs ~12us/row
    # in conv/element_at trees — measured, see sha1_b32_expr docstring).
    df = df.withColumn(
        "_digest", F.replace(F.col("payload_digest"), F.lit("sha1:"),
                             F.lit("")))
    digest = F.col("_digest")
    # resolved-without-fabrication part of the CASE; NULL means "fabricate"
    checksum_pre = (
        F.when(rt == "revisit", F.coalesce(digest, F.lit("-")))
        .when((rt == "response") & (is_resp_ct | has_body), digest))
    df = df.withColumn("_checksum_pre", checksum_pre)
    # hash the BINARY body slice directly (substring on BinaryType is
    # byte-positional) — same bytes as the latin-1 _content view, minus a
    # decode/encode round trip per row
    content_bin = F.when(
        has_body,
        F.substring(F.col("payload"), cstart, F.length("payload")))
    empty_bin = F.lit(b"")
    fab_body = (
        F.when((rt == "response") & is_resp_ct,
               F.coalesce(content_bin, F.col("payload"), empty_bin))
        .when((rt == "response") & has_body, content_bin)
        .otherwise(F.coalesce(F.col("payload"), empty_bin)))
    df = df.withColumn(
        "_fab_hex",
        F.when(F.col("_checksum_pre").isNull(), F.sha1(fab_body)))

    # P7 inputs: x-robots-tag header + a bounded html-head slice for the
    # python meta scan.  Reference scans <meta> tags up to (?i)</head> (or
    # the whole body if absent, cdx_writer.py:165-230); the slice keeps 4 KiB
    # past </head> so a tag straddling it stays intact.
    #
    # Case-insensitive search WITHOUT copying the body: a zero-copy
    # intrinsic indexOf finds the first lowercase "</head>" (the 99.9% case,
    # early-terminating at the head end); the exact (?i)-leftmost match can
    # only start at or before it, so only that head-sized prefix is lowered
    # and rescanned (latin-1 lower() preserves char positions 1:1).  Only
    # when NO lowercase "</head>" exists does the full body pay the lower().
    # All of it runs only for ≤5MB text/html response bodies (meta_gate) —
    # the old plan scanned+lowered every body twice, html or not.
    clen = F.col("content_length_hdr")
    meta_gate = ((rt == "response") & (F.col("_mime") == "text/html")
                 & has_body & (clen.isNull() | (clen <= META_PARSE_LIMIT)))
    df = df.withColumn("_mgate", meta_gate)
    mgate = F.col("_mgate")
    df = df.withColumn(
        "_hpf",
        F.when(mgate,
               F.nullif(F.call_function("locate", F.lit("</head>"), pay,
                                        cstart), F.lit(0)) - cstart + 1))
    body_low = F.lower(pay.substr(
        cstart, F.coalesce(F.col("_hpf") + 6, F.length(pay))))
    df = df.withColumn(
        "_hp",
        F.when(mgate, F.coalesce(F.nullif(F.locate("</head>", body_low),
                                          F.lit(0)), F.lit(0))))
    hp = F.col("_hp")
    # the slice ships as BINARY cut straight from the payload: char
    # offsets in the latin-1 view ARE byte offsets, so one binary
    # substring replaces the string-substr + encode round trip (two
    # body-sized copies -> one; interleaved A/B at 10^7 records read
    # 30.0-30.6s vs 32.2-32.7s, every pair).
    # (A JVM-side "<meta" pre-gate on the slice — lower()+locate so rows
    # with no meta tag ship nothing to Python — was measured this round:
    # +4s of JVM time per 10^7-row index run against a Python saving
    # that is hidden anyway, because ArrowEvalPython pipelines the
    # Python scan behind the JVM stage on the 2-cpu index tasks.
    # Rejected; evidence in OPTIMIZATION_r06.md.)
    slice_b = (F.when(hp > 0,
                      F.substring(F.col("payload"), cstart,
                                  hp + F.lit(4102)))
               .otherwise(F.substring(F.col("payload"), cstart,
                                      F.length("payload"))))
    df = (df.withColumn("_status", status)
            .withColumn("_x_robots", header("x-robots-tag"))
            .withColumn("_meta_slice", F.when(mgate, slice_b)))
    return df.drop("_pay", "_is_http", "_pos", "_hdrs", "_sep_len",
                   "_has_body", "_is_resp_ct", "_ct_hdr", "_ct_stripped",
                   "_pre_semi_m", "_pre_semi", "_ct_replaced", "_digest",
                   "_mgate", "_hpf", "_hp")


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

    if screenshot_mode:
        # niche path: keep the reference-shaped all-python kernel
        udf = _make_py_fields_udf(True)
        df = df.withColumn("_py", udf(
            "record_type", "url_raw", "content_type", "payload",
            "content_length_hdr", "payload_digest", "sfps", "filename"))
        mime_c = F.col("_py.mime")
        status_c = F.col("_py.status")
        checksum_c = F.col("_py.checksum")
    else:
        # hot path: byte-heavy kernels as whole-stage-codegen Column exprs
        # over the latin-1 (lossless bytes<->chars) view of the payload;
        # python sees only url bytes + a bounded html-head slice.
        df = _jvm_fields(df)
        mime_c = F.col("_mime")
        status_c = F.col("_status")
        checksum_c = F.coalesce(F.col("_checksum_pre"),
                                F.col("_py.checksum_fab"))
        df = df.withColumn("_py", _py_url_meta_udf(
            "record_type", "url_raw", "filename", "_meta_slice",
            "_x_robots", "sfps", "_fab_hex"))

    df = df.select(
        F.col("_py.urlkey").alias("urlkey"),
        date_expr(F.col("date_raw")).alias("cdx_date"),
        F.col("_py.original_url").alias("original_url"),
        mime_c.alias("mime"),
        status_c.alias("status_code"),
        checksum_c.alias("checksum"),
        F.lit("-").alias("redirect"),
        F.col("_py.meta_flags").alias("meta_flags"),
        F.coalesce(F.col("compressed_size").cast("string"), F.lit("-")).alias("rec_size"),
        F.col("offset").cast("string").alias("rec_offset"),
        F.col("filename").alias("warc_name"),
        F.col("record_idx"),
    )

    if excludes is not None:
        if isinstance(excludes, DataFrame):
            n_pfx = excludes.count()
            if n_pfx > BNLJ_MAX_PREFIXES:
                # big lists (full archive banlists, 10^5-10^6 prefixes):
                # any nested-loop shape is O(records x prefixes) compute —
                # use the range-partitioned ordered merge instead
                # (operators/exclude.py): one shuffle, no per-prefix work
                # per record
                from .exclude import prefix_exclude_flag
                df = prefix_exclude_flag(df, excludes, key="urlkey")
                if not keep_excluded_flag:
                    df = df.filter(~F.col("excluded")).drop("excluded")
                return df
            # moderate lists: collect to the driver (bounded by
            # BNLJ_MAX_PREFIXES) and use the literal-array exists() path
            # below — no join at all, and no duplicate output rows when
            # prefixes overlap (a LEFT prefix join emits one row per
            # matching prefix)
            excludes = [r[0] for r in excludes.collect()]
        if len(excludes) > 0:
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
