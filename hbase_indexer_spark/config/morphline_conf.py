"""Kite morphlines.conf ingestion: compile a reference-format morphline
pipeline straight into this engine's indexer conf.

The reference mounts a Kite-Morphlines command chain per indexer
(LocalMorphlineResultToSolrMapper.java:109-166): ``extractHBaseCells``
maps cells to record fields, then arbitrary record commands transform
the record.  A user migrating from the reference can hand their
``morphlines.conf`` to :func:`morphline_to_conf` and get back the dict
this engine's ``IndexerConf.from_dict`` consumes — ``extractHBaseCells``
mappings become FieldDefs, and each known Kite command becomes its
registered transform stage (MORPHLINES.md is the compat table).

The config language is HOCON; :func:`parse_hocon` implements the subset
morphline files actually use (objects, arrays, bare/quoted scalars,
``#``/``//`` comments, ``${VAR}`` substitutions — left as ``${VAR}``
strings so the engine's own morphlineVariable templating resolves them,
LocalMorphlineResultToSolrMapper.java:114-127).

Unknown commands fail loudly with the ``register_stage`` escape hatch
(U4) rather than silently dropping a pipeline step.
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# HOCON-subset parser
# ---------------------------------------------------------------------------

_TOKEN = re.compile(
    r"""
    (?P<ws>[ \t\r]+)
  | (?P<comment>(\#|//)[^\n]*)
  | (?P<nl>\n)
  | (?P<punct>[{}\[\],:=])
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<subst>\$\{[^}]*\})
  | (?P<bare>[^\s{}\[\],:=\#"]+)
    """,
    re.X,
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(text):
        m = _TOKEN.match(text, i)
        if not m:
            raise ValueError(f"bad HOCON at offset {i}: {text[i:i+40]!r}")
        kind = m.lastgroup
        if kind not in ("ws", "comment"):
            out.append((kind, m.group()))
        i = m.end()
    return out


def _coerce(tok: str):
    if tok == "true":
        return True
    if tok == "false":
        return False
    if tok == "null":
        return None
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        pass
    return tok


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def _peek(self, skip_nl: bool = True):
        j = self.i
        while j < len(self.toks) and skip_nl and self.toks[j][0] == "nl":
            j += 1
        return self.toks[j] if j < len(self.toks) else (None, None)

    def _next(self, skip_nl: bool = True):
        while self.i < len(self.toks) and skip_nl \
                and self.toks[self.i][0] == "nl":
            self.i += 1
        if self.i >= len(self.toks):
            return (None, None)
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse_value(self):
        kind, tok = self._next()
        if tok == "{":
            return self.parse_object()
        if tok == "[":
            return self.parse_array()
        if kind == "string":
            return tok[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        if kind == "subst":
            return tok  # left literal for downstream ${var} templating
        if kind == "bare":
            # bare scalars may span tokens up to the next separator
            # (e.g. an unquoted `yyyy/MM/dd HH:mm` — rare; morphline
            # files quote those), single token is the common case
            return _coerce(tok)
        raise ValueError(f"unexpected token {tok!r}")

    def parse_object(self) -> dict:
        out = {}
        while True:
            kind, tok = self._next()
            if tok == "}" or tok is None:
                return out
            if tok == ",":
                continue
            if kind == "string":
                key = tok[1:-1]
            elif kind == "bare":
                key = tok
            else:
                raise ValueError(f"bad object key {tok!r}")
            nk, nt = self._peek()
            if nt in (":", "="):
                self._next()
                out[key] = self.parse_value()
            elif nt == "{":
                self._next()
                out[key] = self.parse_object()
            else:
                raise ValueError(f"expected ':' or '{{' after key {key!r}")

    def parse_array(self) -> list:
        out = []
        while True:
            kind, tok = self._peek()
            if tok == "]" or tok is None:
                self._next()
                return out
            if tok == ",":
                self._next()
                continue
            out.append(self.parse_value())


def parse_hocon(text: str) -> dict:
    """Parse the morphline-file HOCON subset into plain dict/list/scalars.
    Top level is an implicit object (``morphlines : [...]``)."""
    p = _Parser(_tokenize(text))
    # implicit top-level braces
    p.toks = [("punct", "{")] + p.toks + [("punct", "}")]
    p.i = 1
    return p.parse_object()


# ---------------------------------------------------------------------------
# Kite command -> engine stage translation
# ---------------------------------------------------------------------------

def _xlate_log(name):
    def fn(params: dict) -> list[dict]:
        # per-record driver logging doesn't exist on a cluster; the analog
        # is a named observe counter (operators/transform.py log_debug)
        return [{"stage": "log_debug", "name": name}]
    return fn


def _xlate_set_values(params: dict) -> list[dict]:
    return [{"stage": "set_field", "field": k, "value": v}
            for k, v in params.items()]


def _xlate_to_lower(params: dict) -> list[dict]:
    return [{"stage": "lowercase_field", "field": params["field"]}]


def _xlate_to_upper(params: dict) -> list[dict]:
    return [{"stage": "uppercase_field", "field": params["field"]}]


def _xlate_trim(params: dict) -> list[dict]:
    return [{"stage": "trim_field", "field": params["field"]}]


def _xlate_decode_base64(params: dict) -> list[dict]:
    return [{"stage": "decode_base64", "field": params["inputField"],
             "into": params.get("outputField", params["inputField"])}]


def _xlate_read_csv(params: dict) -> list[dict]:
    out = {"stage": "read_csv", "field": params.get("inputField", "text"),
           "columns": list(params["columns"])}
    if "separator" in params:
        out["separator"] = params["separator"]
    if "trim" in params:
        out["trim"] = params["trim"]
    return [out]


def _xlate_extract_uri(params: dict) -> list[dict]:
    return [{"stage": "extract_uri_components",
             "field": params["inputField"],
             "outputFieldPrefix": params.get("outputFieldPrefix", "")}]


def _xlate_split(params: dict) -> list[dict]:
    return [{
        "stage": "split_field",
        "field": params["inputField"],
        "into": params.get("outputField", params["inputField"]),
        "pattern": re.escape(params.get("separator", ",")),
    }]


def _xlate_convert_timestamp(params: dict) -> list[dict]:
    out = {"stage": "convert_timestamp", "field": params["field"]}
    if "inputFormats" in params:
        out["input_formats"] = params["inputFormats"]
    if "outputFormat" in params:
        out["output_format"] = params["outputFormat"]
    # r9: Kite timezone params (wall-clock reinterpretation, session
    # stays pinned UTC).  Kite also takes input/outputLocale; locales
    # only affect text month/day names, which Spark renders in its own
    # locale — reject non-ROOT locales loudly rather than mis-parse.
    if "inputTimezone" in params:
        out["input_timezone"] = params["inputTimezone"]
    if "outputTimezone" in params:
        out["output_timezone"] = params["outputTimezone"]
    for loc in ("inputLocale", "outputLocale"):
        if params.get(loc) not in (None, "", "ROOT", "ENGLISH", "US"):
            raise ValueError(
                f"convertTimestamp {loc}={params[loc]!r} is not "
                "supported — Spark formats with the JVM default locale; "
                "use locale-neutral numeric patterns")
    return [out]


# core grok pattern dictionary (the logstash/Kite base set a morphline
# actually uses; extendable per-command via dictionaryString)
GROK_BUILTINS = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?[0-9]+",
    "BASE10NUM": r"[+-]?(?:[0-9]+(?:\.[0-9]+)?|\.[0-9]+)",
    "NUMBER": r"[+-]?(?:[0-9]+(?:\.[0-9]+)?|\.[0-9]+)",
    "POSINT": r"[0-9]+",
    "YEAR": r"(?:\d\d){1,2}",
    "MONTHNUM": r"0?[1-9]|1[0-2]",
    "MONTHDAY": r"(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9]",
    "HOUR": r"2[0123]|[01]?[0-9]",
    "MINUTE": r"[0-5][0-9]",
    "SECOND": r"(?:[0-5][0-9]|60)(?:[:.,][0-9]+)?",
    "IP": r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"[a-zA-Z0-9._-]+",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "LOGLEVEL": (r"[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|"
                 r"[Nn]otice|NOTICE|[Ii]nfo|INFO|[Ww]arn?(?:ing)?|"
                 r"WARN?(?:ING)?|[Ee]rr?(?:or)?|ERR?(?:OR)?|"
                 r"[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL"),
}

_GROK_REF = re.compile(r"%\{(\w+)(?::(\w+))?\}")


def expand_grok(pattern: str, dictionary: dict[str, str] | None = None,
                _depth: int = 0) -> str:
    """Expand ``%{NAME:field}`` grok references into Java-style named
    groups ``(?<field>...)`` (and ``%{NAME}`` into non-capturing groups)
    using :data:`GROK_BUILTINS` plus an optional per-command dictionary.
    Dictionary entries may reference other patterns (bounded depth)."""
    if _depth > 10:
        raise ValueError(f"grok pattern recursion too deep in {pattern!r}")
    table = dict(GROK_BUILTINS)
    if dictionary:
        table.update(dictionary)

    def sub(m: re.Match) -> str:
        name, field = m.group(1), m.group(2)
        if name not in table:
            raise ValueError(
                f"unknown grok pattern %{{{name}}} — add it to the "
                f"command's dictionaryString or GROK_BUILTINS")
        body = expand_grok(table[name], dictionary, _depth + 1)
        if field:
            return f"(?<{field}>{body})"
        return f"(?:{body})"

    return _GROK_REF.sub(sub, pattern)


def _parse_dictionary_string(s: str) -> dict[str, str]:
    """Kite ``dictionaryString``: one ``NAME pattern`` definition per
    line (grok dictionary file format)."""
    out = {}
    for line in s.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        name, _, pat = line.partition(" ")
        if not pat:
            raise ValueError(f"bad grok dictionary line {line!r}")
        out[name] = pat.strip()
    return out


def _load_dictionary_files(paths: list[str]) -> dict[str, str]:
    """Kite ``dictionaryFiles`` (r9): each entry is a grok pattern file
    (NAME pattern per line) or a directory of them (loaded in sorted
    name order, Kite's behavior).  Read once at CONF-COMPILE time on
    the driver — the expanded pattern ships to executors as a plain
    regex literal, so no file needs to exist cluster-side."""
    import os

    out: dict[str, str] = {}
    for path in paths:
        if os.path.isdir(path):
            files = [os.path.join(path, n) for n in sorted(os.listdir(path))
                     if os.path.isfile(os.path.join(path, n))]
        else:
            files = [path]
        for fp in files:
            with open(fp, encoding="utf-8") as f:
                out.update(_parse_dictionary_string(f.read()))
    return out


def _xlate_grok(params: dict) -> list[dict]:
    # Kite grok: expressions maps record field -> pattern; %{NAME:field}
    # references expand from the builtin + dictionaryFiles (compile-time
    # disk read, r9) + dictionaryString dictionaries — later wins
    exprs = params.get("expressions", {})
    extra = _load_dictionary_files(params.get("dictionaryFiles", []))
    extra.update(_parse_dictionary_string(params.get("dictionaryString", "")))
    return [{"stage": "regex_extract", "field": f,
             "pattern": expand_grok(p, extra), "drop_unmatched": True}
            for f, p in exprs.items()]


def _xlate_extract_json(params: dict) -> list[dict]:
    return [{"stage": "extract_json_paths",
             "field": params.get("field", "_attachment_body"),
             "paths": params["paths"]}]


def _xlate_read_avro(params: dict) -> list[dict]:
    return [{"stage": "read_avro_container",
             "field": params.get("field", "_attachment_body")}]


def _xlate_extract_avro(params: dict) -> list[dict]:
    return [{"stage": "extract_avro_paths", "paths": {
        out: (p if isinstance(p, str) else str(p))
        for out, p in params["paths"].items()}}]


def _xlate_sanitize(params: dict) -> list[dict]:
    if "keep" not in params:
        raise ValueError(
            "sanitizeUnknownSolrFields reads the schema from Solr in the "
            "reference; here pass keep: [field, ...] listing the declared "
            "schema explicitly")
    return [{"stage": "sanitize_unknown_fields", "keep": params["keep"]}]


def _xlate_translate(params: dict) -> list[dict]:
    out = {"stage": "translate", "field": params["field"],
           "dictionary": params["dictionary"]}
    if "fallback" in params:
        out["fallback"] = params["fallback"]
    return [out]


def _xlate_find_replace(params: dict) -> list[dict]:
    return [{"stage": "find_replace", "field": params["field"],
             "pattern": params["pattern"],
             "replacement": params.get("replacement", ""),
             "is_regex": bool(params.get("isRegex", False))}]


def _xlate_read_line(params: dict) -> list[dict]:
    out = {"stage": "read_line",
           "field": params.get("inputField", "_attachment_body"),
           "into": params.get("outputField", "line")}
    if params.get("ignoreFirstLine"):
        out["ignore_first_line"] = True
    if "commentPrefix" in params:
        out["comment_prefix"] = params["commentPrefix"]
    return [out]


def _xlate_read_json(params: dict) -> list[dict]:
    return [{"stage": "read_json",
             "field": params.get("inputField", "_attachment_body"),
             "into": params.get("outputField", "json")}]


def _xlate_generate_uuid(params: dict) -> list[dict]:
    if "fromFields" not in params:
        raise ValueError(
            "generateUUID draws a RANDOM uuid per record in the reference, "
            "which breaks replay idempotence on a cluster; this engine's "
            "analog is name-based — pass fromFields : [field, ...] naming "
            "the identity columns (see generate_uuid in "
            "operators/transform.py)")
    out = {"stage": "generate_uuid", "field": params.get("field", "id"),
           "from_fields": params["fromFields"],
           "preserve_existing": bool(params.get("preserveExisting", True))}
    if "prefix" in params:
        out["prefix"] = params["prefix"]
    return [out]


def _xlate_geo_ip(params: dict) -> list[dict]:
    if "ranges" not in params:
        raise ValueError(
            "geoIP streams the Maxmind binary database in the reference; "
            "this engine's analog takes an explicit CIDR dictionary — "
            "pass ranges : { \"1.2.3.0/24\" : \"US\", ... } (see geo_ip "
            "in operators/transform.py)")
    out = {"stage": "geo_ip",
           "field": params.get("inputField", "ip"),
           "into": params.get("outputField", "geo"),
           "ranges": params["ranges"]}
    if "fallback" in params:
        out["fallback"] = params["fallback"]
    return [out]


def _xlate_drop_record(params: dict) -> list[dict]:
    return [{"stage": "filter_rows", "predicate": "false"}]


def _xlate_if(params: dict) -> list[dict]:
    cond = params.get("conditions")
    if not isinstance(cond, str):
        raise ValueError(
            "Kite 'if' conditions are command chains; this engine's "
            "set-oriented branch takes a SQL boolean — write "
            "conditions : \"<sql expr>\" (see if_then_else in "
            "operators/transform.py)")
    return [{"stage": "if_then_else", "condition": cond,
             "then": _commands_to_stages(params.get("then", [])),
             "else": _commands_to_stages(params.get("else", []))}]


def _xlate_sample(params: dict) -> list[dict]:
    if "keyFields" not in params:
        raise ValueError(
            "sample uses a PRNG in the reference — non-idempotent under "
            "replay/retry; this engine's analog is hash-based — pass "
            "keyFields : [col, ...] naming the row identity (see sample "
            "in operators/transform.py)")
    return [{"stage": "sample",
             "probability": params.get("probability", 1.0),
             "key_fields": list(params["keyFields"])}]


def _xlate_tokenize_text(params: dict) -> list[dict]:
    out = {"stage": "tokenize_text",
           "field": params["inputField"],
           "into": params.get("outputField", params["inputField"])}
    if "pattern" in params:
        out["pattern"] = params["pattern"]
    if params.get("lowercase"):
        out["lowercase"] = True
    return [out]


def _xlate_xquery(params: dict) -> list[dict]:
    if "paths" not in params:
        raise ValueError(
            "xquery runs Saxon in the reference; this engine's analog "
            "evaluates XPath 1.0 string expressions JVM-side — pass "
            "paths : { outField : \"/a/b/text()\", ... } and inputField "
            "(see extract_xml_paths in operators/transform.py)")
    return [{"stage": "extract_xml_paths",
             "field": params.get("inputField", "xml"),
             "paths": dict(params["paths"])}]


_COMMAND_XLATE = {
    "logDebug": _xlate_log("logDebug"),
    "logTrace": _xlate_log("logTrace"),
    "logInfo": _xlate_log("logInfo"),
    "logWarn": _xlate_log("logWarn"),
    "setValues": _xlate_set_values,
    "addValues": _xlate_set_values,
    "toLowerCase": _xlate_to_lower,
    "toUpperCase": _xlate_to_upper,
    "trim": _xlate_trim,
    "decodeBase64": _xlate_decode_base64,
    "readCSV": _xlate_read_csv,
    "extractURIComponents": _xlate_extract_uri,
    "split": _xlate_split,
    "convertTimestamp": _xlate_convert_timestamp,
    "grok": _xlate_grok,
    "extractJsonPaths": _xlate_extract_json,
    "readAvroContainer": _xlate_read_avro,
    "extractAvroPaths": _xlate_extract_avro,
    "sanitizeUnknownSolrFields": _xlate_sanitize,
    "translate": _xlate_translate,
    "findReplace": _xlate_find_replace,
    "dropRecord": _xlate_drop_record,
    "if": _xlate_if,
    "readLine": _xlate_read_line,
    "readJson": _xlate_read_json,
    "generateUUID": _xlate_generate_uuid,
    "geoIP": _xlate_geo_ip,
    "sample": _xlate_sample,
    "tokenizeText": _xlate_tokenize_text,
    "xquery": _xlate_xquery,
}

# byte[] passthrough maps to the engine's identity decode
_TYPE_MAP = {"byte[]": "bytes"}


def _mapping_to_field(m: dict) -> dict:
    """One extractHBaseCells mapping -> a fields[] dict
    (ExtractHBaseCellsBuilder.java:120-240 surface)."""
    out: dict = {"value": m["inputColumn"]}
    if "outputField" in m:
        out["name"] = m["outputField"]
    if "outputFields" in m:
        out["output_fields"] = list(m["outputFields"])
    if "type" in m:
        t = m["type"]
        out["type"] = _TYPE_MAP.get(t, t)
    if "source" in m:
        out["source"] = m["source"]
    return out


def _commands_to_stages(commands: list) -> list[dict]:
    from hbase_indexer_spark.operators.transform import STAGE_REGISTRY

    stages: list[dict] = []
    for cmd in commands:
        if not (isinstance(cmd, dict) and len(cmd) == 1):
            raise ValueError(f"malformed command: {cmd!r}")
        (name, params), = cmd.items()
        params = params if isinstance(params, dict) else {}
        if name == "extractHBaseCells":
            raise ValueError("extractHBaseCells must be the first command")
        if name in _COMMAND_XLATE:
            stages.extend(_COMMAND_XLATE[name](params))
        elif name in STAGE_REGISTRY:
            # engine-native stage names pass straight through — the
            # register_stage escape hatch for commands with no Kite analog
            stages.append({"stage": name, **params})
        else:
            raise ValueError(
                f"no analog for Kite command {name!r}; register one with "
                f"hbase_indexer_spark.operators.transform.register_stage"
                f"({name!r}) and reference it by that name (MORPHLINES.md "
                f"has the supported-command table)")
    return stages


def select_morphline(conf: dict, morphline_id: str | None = None) -> dict:
    """Pick the morphline by id (morphlineId param of the reference
    mapper), defaulting to the first — Kite's own behavior."""
    morphlines = conf.get("morphlines", [])
    if not morphlines:
        raise ValueError("no morphlines in config")
    if morphline_id is None:
        return morphlines[0]
    for m in morphlines:
        if m.get("id") == morphline_id:
            return m
    raise ValueError(f"no morphline with id {morphline_id!r}")


def _substitute(node, variables: dict):
    if isinstance(node, str):
        return re.sub(r"\$\{([^}]+)\}",
                      lambda mm: str(variables.get(mm.group(1),
                                                   mm.group(0))),
                      node)
    if isinstance(node, list):
        return [_substitute(v, variables) for v in node]
    if isinstance(node, dict):
        return {k: _substitute(v, variables) for k, v in node.items()}
    return node


def morphline_to_conf(text: str, table: str,
                      morphline_id: str | None = None,
                      variables: dict | None = None,
                      **conf_overrides) -> dict:
    """Compile a morphlines.conf into this engine's indexer-conf dict:
    ``extractHBaseCells`` mappings -> ``fields``, remaining commands ->
    ``transform_stages``.  ``variables`` resolves ``${VAR}`` at load time
    (Kite resolves substitutions from config/env the same way,
    extractHBaseCellsWithVariables.conf); unresolved ones survive as
    ``${VAR}`` strings for the conf's own morphlineVariable templating.
    Pass the target ``table`` (the reference carries it in the XML
    <indexer>, not the morphline) and any IndexerConf overrides as
    keywords."""
    m = select_morphline(parse_hocon(text), morphline_id)
    if variables:
        m = _substitute(m, variables)
    commands = m.get("commands", [])
    if not commands or "extractHBaseCells" not in commands[0]:
        raise ValueError(
            "morphline must start with extractHBaseCells (the reference "
            "requires it too: LocalMorphlineResultToSolrMapper.java:142)")
    fields = [_mapping_to_field(mp)
              for mp in commands[0]["extractHBaseCells"].get("mappings", [])]
    conf = {
        "table": table,
        "fields": fields,
        "transform_stages": _commands_to_stages(commands[1:]),
    }
    conf.update(conf_overrides)
    return conf
