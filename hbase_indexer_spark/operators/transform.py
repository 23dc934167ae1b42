"""Transform-stage chains — the Morphline ETL analog (reference §2.3
P15/P16, §2.9 U1-U4).

The reference compiles a Kite-Morphlines command pipeline per indexer
(LocalMorphlineResultToSolrMapper.java:109-166): extractHBaseCells followed
by arbitrary record commands, with ``morphlineVariable.*`` substituted into
the config and ``morphlineField.*`` force-set on every record
(:114-131; MR plumbing HBaseIndexerMapper.java:205-212).

Spark-first: a chain is a list of named stages, each a
``DataFrame -> DataFrame`` transform compiled from config.  Stages are
declarative wrappers over Catalyst expressions wherever possible (so the
chain stays in whole-stage codegen); a custom stage registered by name can
do anything, including `mapInPandas` (the arbitrary-command escape hatch,
U4).  Record-drop commands are filters.
"""

from __future__ import annotations

import re
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Stage = Callable[[DataFrame], DataFrame]
StageFactory = Callable[[dict], Stage]

STAGE_REGISTRY: dict[str, StageFactory] = {}


def register_stage(name: str) -> Callable[[StageFactory], StageFactory]:
    """U4 — named stage plugin (the CommandBuilder analog,
    ExtractHBaseCellsBuilder.java:50-60: commands are looked up by name)."""

    def deco(fn: StageFactory) -> StageFactory:
        STAGE_REGISTRY[name] = fn
        return fn

    return deco


# -- built-in stages ---------------------------------------------------------

@register_stage("set_field")
def _set_field(params: dict) -> Stage:
    """morphlineField.* force-set (HBaseIndexerMapper.java:205-212)."""
    name, value = params["field"], params["value"]
    return lambda df: df.withColumn(name, F.lit(value))


@register_stage("rename_field")
def _rename_field(params: dict) -> Stage:
    src, dst = params["from"], params["to"]
    return lambda df: df.withColumnRenamed(src, dst)


@register_stage("drop_field")
def _drop_field(params: dict) -> Stage:
    name = params["field"]
    return lambda df: df.drop(name)


@register_stage("filter_rows")
def _filter_rows(params: dict) -> Stage:
    """Record-drop command: rows failing the predicate leave the pipeline."""
    predicate = params["predicate"]
    return lambda df: df.filter(F.expr(predicate))


@register_stage("split_field")
def _split_field(params: dict) -> Stage:
    """CSV-ish one-to-many value command (the e2e custom-mapper scenario,
    IndexerIT.java:678-721 splits a CSV cell into multiple values)."""
    name = params["field"]
    out = params.get("into", name)
    pattern = params.get("pattern", ",")
    return lambda df: df.withColumn(out, F.split(F.col(name), pattern))


@register_stage("lowercase_field")
def _lowercase_field(params: dict) -> Stage:
    name = params["field"]
    return lambda df: df.withColumn(name, F.lower(F.col(name)))


@register_stage("uppercase_field")
def _uppercase_field(params: dict) -> Stage:
    name = params["field"]
    return lambda df: df.withColumn(name, F.upper(F.col(name)))


@register_stage("trim_field")
def _trim_field(params: dict) -> Stage:
    """Kite `trim` analog: strip leading/trailing whitespace in place."""
    name = params["field"]
    return lambda df: df.withColumn(name, F.trim(F.col(name)))


@register_stage("decode_base64")
def _decode_base64(params: dict) -> Stage:
    """Kite `decodeBase64` analog: base64 string field -> bytes (or a
    UTF-8 string with ``as_string: true``) — JVM-side ``unbase64``."""
    name = params["field"]
    out = params.get("into", name)
    col = F.unbase64(F.col(name))
    if params.get("as_string"):
        col = col.cast("string")
    return lambda df: df.withColumn(out, col)


@register_stage("read_csv")
def _read_csv(params: dict) -> Stage:
    """Kite `readCSV` analog over a string FIELD (rows already exist here
    — the scan is the reader, so the command degenerates to a positional
    split): ``field`` splits on ``separator`` (literal) and each name in
    ``columns`` binds the next position; ``trim: true`` strips each
    value; a ``""`` column name skips that position (Kite convention).
    Missing positions become NULL (``try_element_at`` — ANSI-safe)."""
    name = params["field"]
    sep = params.get("separator", ",")
    cols = list(params["columns"])
    do_trim = bool(params.get("trim", True))

    def stage(df):
        parts = F.split(F.col(name), re.escape(sep))
        out = df.withColumn("_csv", parts)
        for i, cname in enumerate(cols):
            if not cname:
                continue
            v = F.try_element_at(F.col("_csv"), F.lit(i + 1))
            if do_trim:
                v = F.trim(v)
            out = out.withColumn(cname, v)
        return out.drop("_csv")

    return stage


@register_stage("extract_uri_components")
def _extract_uri_components(params: dict) -> Stage:
    """Kite `extractURIComponents` analog: parse a URI string field into
    ``{prefix}scheme/authority/host/port/path/query/fragment`` via
    JVM-side ``try_parse_url`` (port comes from a regex over the authority —
    parse_url has no PORT part).  Unparseable/absent parts are NULL."""
    name = params["field"]
    prefix = params.get("outputFieldPrefix", params.get("prefix", ""))
    u = F.col(name)

    def stage(df):
        authority = F.try_parse_url(u, F.lit("AUTHORITY"))
        return (
            df.withColumn(prefix + "scheme", F.try_parse_url(u, F.lit("PROTOCOL")))
            .withColumn(prefix + "authority", authority)
            .withColumn(prefix + "host", F.try_parse_url(u, F.lit("HOST")))
            .withColumn(
                prefix + "port",
                F.nullif(F.regexp_extract(authority, ":([0-9]+)$", 1),
                         F.lit("")).cast("int"))
            .withColumn(prefix + "path", F.try_parse_url(u, F.lit("PATH")))
            .withColumn(prefix + "query", F.try_parse_url(u, F.lit("QUERY")))
            .withColumn(prefix + "fragment", F.try_parse_url(u, F.lit("REF")))
        )

    return stage


@register_stage("sql_expr")
def _sql_expr(params: dict) -> Stage:
    """General computed field from a SQL expression (the logDebug/convert
    commands' declarative form)."""
    name = params["field"]
    expr = params["expr"]
    return lambda df: df.withColumn(name, F.expr(expr))


@register_stage("convert_timestamp")
def _convert_timestamp(params: dict) -> Stage:
    """Kite ``convertTimestamp`` analog: parse ``field`` with the first
    matching input format and re-emit in ``output_format``.  Formats are
    Spark datetime patterns; ``unixTimeInMillis`` / ``unixTimeInSeconds``
    are accepted like Kite's special tokens.  Stays in codegen: the
    try-each-format cascade compiles to coalesce(to_timestamp(...)...).

    ``input_timezone`` / ``output_timezone`` (Kite ``inputTimezone`` /
    ``outputTimezone``, r9 — the last morphline compat caveat): a
    pattern-parsed string is read as WALL-CLOCK time in the input zone
    (``to_utc_timestamp``), and pattern output is the wall clock of the
    output zone (``from_utc_timestamp``) — the session stays pinned
    UTC, no conf mutation.  Epoch tokens are zone-independent on both
    sides, exactly like Kite's SimpleDateFormat handling."""
    name = params["field"]
    out = params.get("into", name)
    in_fmts = params.get("input_formats", ["yyyy-MM-dd'T'HH:mm:ss'Z'"])
    out_fmt = params.get("output_format", "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    in_tz = params.get("input_timezone", "UTC")
    out_tz = params.get("output_timezone", "UTC")

    def parse_one(fmt):
        c = F.col(name)
        if fmt == "unixTimeInMillis":
            return F.timestamp_millis(c.cast("long"))
        if fmt == "unixTimeInSeconds":
            return F.timestamp_seconds(c.cast("long"))
        # session tz is pinned UTC, so try_to_timestamp yields the naive
        # wall clock; re-interpret it in the declared input zone
        parsed = F.try_to_timestamp(c, F.lit(fmt))
        if in_tz != "UTC":
            parsed = F.to_utc_timestamp(parsed, in_tz)
        return parsed

    def stage(df: DataFrame) -> DataFrame:
        ts = F.coalesce(*[parse_one(f) for f in in_fmts])
        if out_fmt == "unixTimeInMillis":
            o = F.unix_millis(ts)
        elif out_fmt == "unixTimeInSeconds":
            o = F.unix_seconds(ts)
        else:
            shown = (F.from_utc_timestamp(ts, out_tz)
                     if out_tz != "UTC" else ts)
            o = F.date_format(shown, out_fmt)
        return df.withColumn(out, o)

    return stage


@register_stage("regex_extract")
def _regex_extract(params: dict) -> Stage:
    """Kite ``grok``/``extract`` analog without the pattern dictionary:
    named groups of ``pattern`` applied to ``field`` become output columns.
    Non-matching rows get NULLs (grok's default) or are dropped when
    ``drop_unmatched`` is set (grok's record-drop behavior).

    Both Python ``(?P<name>...)`` and Java ``(?<name>...)`` named-group
    syntax are accepted; the pattern executes JVM-side (regexp_extract)."""
    name = params["field"]
    # normalize named-group syntax: Python form for groupindex parsing,
    # Java form for the JVM regex engine
    py_pattern = re.sub(r"\(\?<(?![=!])", "(?P<", params["pattern"])
    # JVM side: strip the names (Java rejects underscores in group names)
    # and address groups positionally — numbering is identical, since named
    # groups participate in positional numbering in both engines
    jvm_pattern = re.sub(r"\(\?P<[^>]+>", "(", py_pattern)
    groups = [g for g, _ in sorted(
        re.compile(py_pattern).groupindex.items(), key=lambda kv: kv[1])]
    if not groups:
        raise ValueError("regex_extract pattern needs named groups "
                         "(?P<name>...)")
    drop_unmatched = params.get("drop_unmatched", False)

    def stage(df: DataFrame) -> DataFrame:
        if drop_unmatched:
            df = df.filter(F.col(name).rlike(jvm_pattern))
        gidx = re.compile(py_pattern).groupindex
        matched = F.col(name).rlike(jvm_pattern)
        # regexp_extract yields '' on no-match; normalize to NULL
        return df.withColumns(
            {g: F.when(matched,
                       F.regexp_extract(F.col(name), jvm_pattern, gidx[g]))
             for g in groups})

    return stage


@register_stage("extract_json_paths")
def _extract_json_paths(params: dict) -> Stage:
    """Kite ``readJson``+``extractJsonPaths`` analog: ``paths`` maps output
    field -> JSONPath (``$.a.b``) evaluated against the JSON text in
    ``field`` (get_json_object — JVM-side, no Python)."""
    name = params["field"]
    paths = params["paths"]
    return lambda df: df.withColumns(
        {out: F.get_json_object(F.col(name), p) for out, p in paths.items()})


@register_stage("read_avro_container")
def _read_avro_container(params: dict) -> Stage:
    """``readAvroContainer`` analog (morphlines.conf:40-41 pairs it with a
    byte[]-typed extractHBaseCells output): parse the Avro Object
    Container File bytes in ``field`` — schema is embedded in the
    container — and emit ONE ROW PER CONTAINED RECORD (morphline commands
    are record multiplicators), each record as canonical JSON in
    ``into``.  One Arrow-batched python hop; pair with
    ``extract_avro_paths`` which stays JVM-side."""
    name = params.get("field", "_attachment_body")
    into = params.get("into", "avro_json")
    keep_source = params.get("keep_source", False)

    def stage(df: DataFrame) -> DataFrame:
        from hbase_indexer_spark.functions.avro_codec import container_to_json

        out = df.withColumn(into, F.explode(container_to_json(F.col(name))))
        return out if keep_source else out.drop(name)

    return stage


@register_stage("write_avro_container")
def _write_avro_container(params: dict) -> Stage:
    """``toAvro`` + ``writeAvroToByteArray`` analog — closes the
    declared-missing Avro WRITE leg (MORPHLINES.md previously listed it
    under "no analog"): serialize the named fields of every row into a
    single-record Avro Object Container File (the byte shape Kite's
    writeAvroToByteArray emits per record) using the same pure-Python
    OCF codec the read leg decodes with, so write→read is a bit-level
    identity the gate can check.

    ``fields`` maps field name -> Avro primitive type (``long``,
    ``string``, ``double``, ``boolean``, ...); every field is written as
    the nullable union ``["null", type]``.  ``into`` (default
    ``_attachment_body``) receives the container bytes; ``codec`` is
    ``null`` or ``deflate``; ``record_name`` names the Avro record.

    Scale: one Arrow-batched pandas UDF (map-only, no shuffle); the
    per-row cost is the varint encode itself."""
    fields: dict[str, str] = params["fields"]
    into = params.get("into", "_attachment_body")
    rec_name = params.get("record_name", "record")
    codec = params.get("codec", "null")
    schema = {"type": "record", "name": rec_name,
              "fields": [{"name": n, "type": ["null", t]}
                         for n, t in fields.items()]}
    names = list(fields)
    int_fields = {n for n, t in fields.items() if t in ("long", "int")}

    @F.pandas_udf("binary")
    def enc(s: pd.DataFrame) -> pd.Series:
        from hbase_indexer_spark.functions.avro_codec import encode_container

        out = []
        for rec in s.to_dict("records"):
            clean = {}
            for n, v in rec.items():
                # pd.isna catches None, NaN, NaT AND pd.NA (r7 ADVICE:
                # the old float-only check let pd.NA crash int())
                if v is None or (not isinstance(v, (list, dict))
                                 and pd.isna(v)):
                    clean[n] = None
                elif n in int_fields:
                    # arrives as a decimal string (see struct below):
                    # exact at any magnitude, unlike the float64 a
                    # nullable long column is promoted to by Arrow
                    clean[n] = int(v)
                else:
                    clean[n] = v
            out.append(encode_container(schema, [clean], codec=codec))
        return pd.Series(out)

    # ship long/int fields as strings: Arrow->pandas promotes nullable
    # integer columns to float64, which silently loses precision above
    # 2^53 — a decimal string round-trips bit-exactly (r7 ADVICE)
    return lambda df: df.withColumn(
        into, enc(F.struct(*[
            F.col(n).cast("string").alias(n) if n in int_fields
            else F.col(n) for n in names])))


@register_stage("extract_avro_paths")
def _extract_avro_paths(params: dict) -> Stage:
    """``extractAvroPaths`` analog (morphlines.conf:43-47): ``paths`` maps
    output field -> record path (``/user_name`` like the reference config,
    nested ``/a/b`` supported); optional ``types`` casts the extracted
    text.  Runs as get_json_object + cast — whole-stage codegen, no
    python."""
    src = params.get("field", "avro_json")
    paths = params["paths"]
    types = params.get("types", {})

    def col_for(path: str) -> F.Column:
        jp = "$" + path.replace("/", ".")
        return F.get_json_object(F.col(src), jp)

    return lambda df: df.withColumns(
        {out: (col_for(p).cast(types[out]) if out in types else col_for(p))
         for out, p in paths.items()})


@register_stage("sanitize_unknown_fields")
def _sanitize_unknown_fields(params: dict) -> Stage:
    """``sanitizeUnknownSolrFields`` analog (used by the reference's MR
    morphlines): drop every column not in the declared schema, keeping
    declared order.  ``keep`` lists the schema fields; columns the frame
    doesn't have are ignored (Solr would supply defaults)."""
    keep = params["keep"]
    return lambda df: df.select(*[c for c in keep if c in df.columns])


@register_stage("log_debug")
def _log_debug(params: dict) -> Stage:
    """``logDebug``/``logTrace`` analog: a pass-through that registers a
    named `observe` metric (count + optional sum) instead of per-record
    driver logging — per-record logs don't exist on a cluster; observed
    metrics arrive with each action/micro-batch (K3 counters)."""
    metric = params.get("name", "log_debug")
    exprs = [F.count(F.lit(1)).alias(f"{metric}_count")]
    if "sum" in params:
        exprs.append(F.sum(F.expr(params["sum"])).alias(f"{metric}_sum"))
    return lambda df: df.observe(metric, *exprs)


@register_stage("if_then_else")
def _if_then_else(params: dict) -> Stage:
    """Kite ``if``/``tryRules`` analog: rows matching ``condition`` (a SQL
    boolean expression) flow through the ``then`` sub-chain, the rest
    through ``else`` (default: pass through unchanged), and the streams
    re-unite by name.

    Set-oriented form of Kite's per-record branch: one filter per branch
    on the same scan (Catalyst collapses shared subtrees under codegen;
    no shuffle is introduced), then unionByName with null-fill so a branch
    may add columns the other lacks — matching morphline records, whose
    fields are open maps."""
    cond = params["condition"]
    then_chain = TransformChain.from_config(params.get("then", []))
    else_chain = TransformChain.from_config(params.get("else", []))

    def stage(df: DataFrame) -> DataFrame:
        c = F.expr(cond)
        then_df = then_chain(df.filter(c))
        # NULL condition rows take the else branch, like SQL CASE
        else_df = else_chain(df.filter(~F.coalesce(c, F.lit(False))))
        return then_df.unionByName(else_df, allowMissingColumns=True)

    return stage


@register_stage("translate")
def _translate(params: dict) -> Stage:
    """Kite ``translate`` analog: map a field's value through a literal
    dictionary; non-matching values keep ``fallback`` (Kite's ``fallback``
    param) or pass through unchanged when no fallback is given.  Compiles
    to one CASE chain — codegen, no join."""
    name = params["field"]
    table = params["dictionary"]
    out = params.get("into", name)

    def stage(df: DataFrame) -> DataFrame:
        src = F.col(name)
        expr = (F.lit(params["fallback"]) if "fallback" in params else src)
        for k, v in table.items():
            expr = F.when(src.cast("string") == str(k), F.lit(v)) \
                .otherwise(expr)
        return df.withColumn(out, expr)

    return stage


@register_stage("find_replace")
def _find_replace(params: dict) -> Stage:
    """Kite ``findReplace`` analog: literal or regex substitution on a
    string field (``pattern``/``replacement``, ``is_regex``) — JVM-side
    regexp_replace/replace, no Python."""
    name = params["field"]
    out = params.get("into", name)
    pattern = params["pattern"]
    replacement = params.get("replacement", "")
    if params.get("is_regex", False):
        return lambda df: df.withColumn(
            out, F.regexp_replace(F.col(name), pattern, replacement))
    return lambda df: df.withColumn(
        out, F.replace(F.col(name), F.lit(pattern), F.lit(replacement)))


@register_stage("read_line")
def _read_line(params: dict) -> Stage:
    """Kite ``readLine`` analog over a string FIELD (the scan already
    produced rows; the command degenerates to a line multiplicator):
    split ``field`` on newlines (CRLF normalized) and emit ONE ROW PER
    LINE in ``into``.  ``ignore_first_line`` and ``comment_prefix``
    match Kite's params (ReadLineBuilder); blank lines are kept unless
    ``skip_blank`` is set.  Pure codegen: split + posexplode."""
    name = params.get("field", "text")
    into = params.get("into", "line")
    ignore_first = bool(params.get("ignore_first_line", False))
    comment = params.get("comment_prefix")
    skip_blank = bool(params.get("skip_blank", False))
    keep_source = params.get("keep_source", False)

    def stage(df: DataFrame) -> DataFrame:
        lines = F.split(
            F.regexp_replace(F.col(name), "\r\n", "\n"), "\n", -1)
        out = df.select("*", F.posexplode(lines).alias("_line_pos", into))
        if ignore_first:
            out = out.filter(F.col("_line_pos") >= 1)
        if comment:
            out = out.filter(~F.col(into).startswith(comment))
        if skip_blank:
            out = out.filter(F.col(into) != "")
        out = out.drop("_line_pos")
        return out if keep_source else out.drop(name)

    return stage


@register_stage("read_json")
def _read_json(params: dict) -> Stage:
    """Kite ``readJson`` analog: the JSON text in ``field`` becomes one
    row per top-level record in ``into`` — a top-level ARRAY is a
    multi-record attachment (one row per element, each element as its
    own JSON text), anything else is a single record passed through.
    ``drop_invalid: true`` drops rows whose record isn't parseable JSON
    (Kite raises; a cluster filter is the set-oriented form).  Pair with
    ``extract_json_paths`` for field extraction.  JVM-side throughout
    (from_json / try_parse_json)."""
    name = params.get("field", "_attachment_body")
    into = params.get("into", "json")
    drop_invalid = bool(params.get("drop_invalid", False))
    keep_source = params.get("keep_source", False)

    def stage(df: DataFrame) -> DataFrame:
        records = F.coalesce(
            F.from_json(F.col(name), "array<string>"),
            F.array(F.col(name)))
        out = df.withColumn(into, F.explode(records))
        if drop_invalid:
            out = out.filter(F.try_parse_json(F.col(into)).isNotNull())
        return out if keep_source else out.drop(name)

    return stage


@register_stage("generate_uuid")
def _generate_uuid(params: dict) -> Stage:
    """Kite ``generateUUID`` analog with one declared substitution: the
    reference draws a RANDOM UUID per record (GenerateUUIDBuilder),
    which breaks replay idempotence and retry determinism on a cluster —
    here the UUID is NAME-BASED, derived from ``from_fields`` (md5 of
    the unit-separator-joined values, formatted 8-4-4-4-12), so
    re-running a batch yields the same ids.  ``preserve_existing``
    (default true, like Kite) keeps a non-null existing value; ``prefix``
    is prepended like Kite's param."""
    field = params.get("field", "id")
    from_fields = params["from_fields"]
    preserve = bool(params.get("preserve_existing", True))
    prefix = params.get("prefix", "")

    def stage(df: DataFrame) -> DataFrame:
        # NULL-safe serialization: concat_ws SKIPS nulls, which would
        # make (a, NULL) and (NULL, a) collide — encode each field as
        # "v<value>" or "n" so null-ness is part of the identity
        h = F.md5(F.concat_ws(
            "\x1f", *[
                F.coalesce(
                    F.concat(F.lit("v"), F.col(c).cast("string")),
                    F.lit("n"))
                for c in from_fields]))
        uid = F.concat_ws(
            "-", F.substring(h, 1, 8), F.substring(h, 9, 4),
            F.substring(h, 13, 4), F.substring(h, 17, 4),
            F.substring(h, 21, 12))
        if prefix:
            uid = F.concat(F.lit(prefix), uid)
        if preserve and field in df.columns:
            uid = F.coalesce(F.col(field).cast("string"), uid)
        return df.withColumn(field, uid)

    return stage


@register_stage("geo_ip")
def _geo_ip(params: dict) -> Stage:
    """Kite ``geoIP`` analog with one declared substitution: the
    reference streams Maxmind's binary city database; a cluster-side
    lookup instead takes an explicit ``ranges`` dictionary mapping IPv4
    CIDR blocks to values (country code, region, anything) — the same
    broadcast-literal recipe as ``translate``.  Longest (most-specific)
    prefix wins; non-matching / unparseable IPs get ``fallback``
    (default NULL).  Pure codegen: IPv4 -> uint32 via split + fold,
    then one CASE chain ordered by prefix length."""
    name = params["field"]
    out = params.get("into", "geo")
    ranges = params["ranges"]
    fallback = params.get("fallback")

    def cidr_bounds(cidr: str) -> tuple[int, int, int]:
        ip, _, plen_s = cidr.partition("/")
        plen = int(plen_s) if plen_s else 32
        parts = [int(p) for p in ip.split(".")]
        base = (parts[0] << 24) | (parts[1] << 16) | (parts[2] << 8) \
            | parts[3]
        mask = ((1 << plen) - 1) << (32 - plen) if plen else 0
        lo = base & mask
        return lo, lo | (~mask & 0xFFFFFFFF), plen

    # most-specific prefix first so the CASE chain resolves overlaps
    compiled = sorted(
        ((cidr_bounds(c), v) for c, v in ranges.items()),
        key=lambda e: -e[0][2])

    def stage(df: DataFrame) -> DataFrame:
        oct_ = F.split(F.col(name), r"\.")
        octet = r"(25[0-5]|2[0-4][0-9]|[01]?[0-9]?[0-9])"
        valid = (F.col(name).rlike(rf"^({octet}\.){{3}}{octet}\z"))
        # try_cast: & does not short-circuit, so the fold is evaluated
        # even for rows `valid` already rejected — ANSI cast would throw
        ip = (F.try_element_at(oct_, F.lit(1)).try_cast("long") * 16777216
              + F.try_element_at(oct_, F.lit(2)).try_cast("long") * 65536
              + F.try_element_at(oct_, F.lit(3)).try_cast("long") * 256
              + F.try_element_at(oct_, F.lit(4)).try_cast("long"))
        expr = F.lit(fallback)
        for (lo, hi, _), v in reversed(compiled):
            expr = F.when(valid & (ip >= lo) & (ip <= hi), F.lit(v)) \
                .otherwise(expr)
        return df.withColumn(out, expr)

    return stage


@register_stage("sample")
def _sample(params: dict) -> Stage:
    """Kite ``sample`` analog with one declared substitution: Kite
    samples with a PRNG, which is non-idempotent under the engine's
    at-least-once replay (a retried batch would keep a different
    subset).  The analog keys the keep/drop decision on a content hash
    of ``key_fields`` — same ``probability`` semantics, but any replica
    or replay of a row decides identically.  Pure codegen: one md5 +
    threshold compare."""
    prob = float(params["probability"])
    fields = params.get("key_fields")
    if not fields:
        raise ValueError(
            "sample: Kite samples with a PRNG — non-idempotent under "
            "replay/retry; this engine's analog is hash-based and needs "
            "key_fields : [col, ...] naming the row identity")
    if not 0.0 <= prob <= 1.0:
        raise ValueError(f"sample: probability {prob} not in [0, 1]")
    from hbase_indexer_spark.pipeline.text import token_hash60

    thresh = int(round(prob * 1_000_000))
    # concat_ws SKIPS NULL fields, so ('a', NULL) and ('a', '') — or a
    # NULL migrating between fields — would collapse to one key and share
    # a keep/drop decision (r5 ADVICE).  Coalesce each field to a
    # sentinel that cannot appear in data (\x00NULL vs the \x1f joiner)
    # so every distinct tuple hashes independently.
    key = F.concat_ws("\x1f", *[
        F.coalesce(F.col(f).cast("string"), F.lit("\x00NULL"))
        for f in fields
    ])
    bucket = F.pmod(token_hash60(key), F.lit(1_000_000))
    return lambda df: df.filter(bucket < thresh)


@register_stage("tokenize_text")
def _tokenize_text(params: dict) -> Stage:
    """Kite ``tokenizeText`` analog with one declared substitution: the
    reference runs a Lucene analyzer from a solrLocator; the analog is
    a regex tokenizer (``pattern``, default whitespace) with optional
    ``lowercase`` — the multi-valued output lands as an ArrayType field
    (P6), JVM-side split + empty-filter."""
    name = params["field"]
    out = params.get("into", name)
    pattern = params.get("pattern", r"\s+")
    lower = bool(params.get("lowercase"))

    def stage(df: DataFrame) -> DataFrame:
        col = F.col(name)
        if lower:
            col = F.lower(col)
        toks = F.filter(F.split(col, pattern), lambda t: t != "")
        return df.withColumn(out, toks)

    return stage


@register_stage("extract_xml_paths")
def _extract_xml_paths(params: dict) -> Stage:
    """Kite morphlines-saxon ``xquery`` analog with one declared
    substitution: full XQuery doesn't exist JVM-side; each ``paths``
    entry is an XPath 1.0 string expression evaluated with Spark's
    ``xpath_string`` over the XML field (the extractJsonPaths shape,
    XML edition).  Unmatched paths yield empty string (xpath_string
    semantics); malformed XML raises — pre-filter with filter_rows if
    the feed is dirty."""
    name = params["field"]
    paths = params["paths"]

    def stage(df: DataFrame) -> DataFrame:
        for out_name, xp in paths.items():
            df = df.withColumn(out_name,
                               F.xpath_string(F.col(name), F.lit(xp)))
        return df

    return stage


_VAR = re.compile(r"\$\{([^}]+)\}")


def substitute_variables(params: dict, variables: dict) -> dict:
    """morphlineVariable.* templating (LocalMorphlineResultToSolrMapper.java:
    114-127): ``${name}`` in any string param is replaced."""

    def sub(v):
        if isinstance(v, str):
            return _VAR.sub(lambda m: str(variables[m.group(1)]), v)
        return v

    return {k: sub(v) for k, v in params.items()}


class TransformChain:
    """A compiled stage pipeline (the Morphline object,
    LocalMorphlineResultToSolrMapper.java:214-240)."""

    def __init__(self, stages: list[Stage]):
        self.stages = stages

    @staticmethod
    def from_config(stages_conf: list[dict],
                    variables: dict | None = None) -> "TransformChain":
        stages = []
        for sc in stages_conf:
            sc = dict(sc)
            name = sc.pop("stage")
            if variables:
                sc = substitute_variables(sc, variables)
            try:
                factory = STAGE_REGISTRY[name]
            except KeyError:
                raise ValueError(f"unknown transform stage {name!r}") from None
            stages.append(factory(sc))
        return TransformChain(stages)

    def __call__(self, df: DataFrame) -> DataFrame:
        for stage in self.stages:
            df = stage(df)
        return df


# -- whole-row mapper registry (U2) -----------------------------------------

RowMapper = Callable[[DataFrame, object], DataFrame]
ROW_MAPPER_REGISTRY: dict[str, RowMapper] = {}


def register_row_mapper(name: str, fn: RowMapper) -> None:
    """U2 — custom ResultToSolrMapper analog (ResultToSolrMapper.java:1-68,
    selected by name in DefaultIndexerComponentFactory.java:94-98): a
    whole-row mapper ``(cells_df, conf) -> docs_df`` that may emit 0..n docs
    per row (UDTF-shaped; typically `applyInPandas`/`mapInPandas`)."""
    ROW_MAPPER_REGISTRY[name] = fn


def row_mapper_for(name: str) -> RowMapper:
    try:
        return ROW_MAPPER_REGISTRY[name]
    except KeyError:
        raise ValueError(f"unknown row mapper {name!r}") from None
