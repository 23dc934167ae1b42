"""Indexer definition config — the analog of the reference's XML config.

Surface mirrors ``indexerconf.xsd`` + IndexerConfBuilder/
DefaultIndexerComponentFactory.java:78-128 (reference), re-expressed as a
plain dict / dataclass:

    conf = IndexerConf.from_dict({
        "table": "indexdemo-user",            # or "regex:sep-user-.*"
        "mapping_type": "row",                # row | column   (IndexerConf.java:51,71)
        "read_row": "dynamic",                # never | dynamic (row mode only)
        "unique_key_field": "id",             # default 'id'   (IndexerConf.java:73)
        "row_field": None,                    # column-mode row field name
        "column_family_field": None,          # column-mode family field name
        "table_name_field": None,
        "unique_key_formatter": "string",     # string | hex
        "fields": [
            {"name": "age_i", "value": "info:age", "source": "value", "type": "int"},
            {"name": "data_*", "value": "info:d_*", "source": "value", "type": "string"},
        ],
    })

Wildcard semantics (ExtractHBaseCellsBuilder.java:223-240): a ``value`` of
``cf:prefix*`` matches every qualifier starting with the prefix; if the field
``name`` ends with ``*`` the matched qualifier tail is appended to the name
stem (dynamic output field).  ``source`` may be ``qualifier`` to index the
qualifier bytes instead of the cell value (ByteArrayExtractors.java:38-60 —
only legal with a wildcard).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from hbase_indexer_spark.functions.bytes_codec import known_type

MAPPING_ROW = "row"
MAPPING_COLUMN = "column"
READ_NEVER = "never"
READ_DYNAMIC = "dynamic"
SOURCE_VALUE = "value"
SOURCE_QUALIFIER = "qualifier"


@dataclass(frozen=True)
class FieldDef:
    """One ``<field>`` element (DefaultIndexerComponentFactory.java:100-118)."""

    name: str
    family: str
    qualifier: str          # exact qualifier, or prefix when wildcard
    wildcard: bool          # value spec ended with '*'
    source: str = SOURCE_VALUE
    type: str = "string"    # default string (IndexerConf.java:76)
    # P8 — positional output fields (ExtractHBaseCellsBuilder.java:210-221):
    # the i-th extracted (qualifier-sorted) value goes to the i-th name;
    # an empty-string name skips that position.
    output_fields: tuple = ()
    # U1 — (key, value) params for a custom value mapper (the Configurable
    # contract, ConfigureUtil.java:1-33); ignored by built-in types.
    params: tuple = ()

    @property
    def dynamic_name(self) -> bool:
        return self.name.endswith("*")

    @property
    def name_stem(self) -> str:
        return self.name[:-1] if self.dynamic_name else self.name


def parse_field_value(value: str) -> tuple[str, str, bool]:
    """Split 'cf:qual' / 'cf:prefix*' (ByteArrayExtractors.java:62-87)."""
    if ":" not in value:
        raise ValueError(f"field value must be 'family:qualifier', got {value!r}")
    family, qual = value.split(":", 1)
    if not family:
        raise ValueError(f"empty column family in {value!r}")
    wildcard = qual.endswith("*")
    if wildcard:
        qual = qual[:-1]
    return family, qual, wildcard


@dataclass(frozen=True)
class IndexerConf:
    table: str
    mapping_type: str = MAPPING_ROW
    read_row: str = READ_DYNAMIC
    unique_key_field: str = "id"
    row_field: str | None = None
    column_family_field: str | None = None
    table_name_field: str | None = None
    unique_key_formatter: str = "string"
    fields: tuple[FieldDef, ...] = field(default_factory=tuple)
    # U2 — named whole-row mapper replacing the default doc build
    # (``mapper=`` attr, DefaultIndexerComponentFactory.java:94-98)
    mapper: str | None = None
    # P15/P16 — post-build transform chain config + variables
    transform_stages: tuple = ()
    variables: tuple = ()  # (key, value) pairs — dict made hashable

    @staticmethod
    def from_dict(d: dict) -> "IndexerConf":
        def parse_fields(specs, name_prefix: str = "") -> list[FieldDef]:
            out = []
            for fd in specs:
                family, qual, wildcard = parse_field_value(fd["value"])
                source = fd.get("source", SOURCE_VALUE)
                ftype = fd.get("type", "string")
                if source not in (SOURCE_VALUE, SOURCE_QUALIFIER):
                    raise ValueError(f"bad source {source!r}")
                if source == SOURCE_QUALIFIER and not wildcard:
                    # ByteArrayExtractors.java:53-58: qualifier source requires wildcard
                    raise ValueError("source=qualifier requires a wildcard qualifier")
                if not known_type(ftype) and not callable(ftype):
                    raise ValueError(f"unknown field type {ftype!r}")
                # positional outputFields are valid for single-cell columns
                # too — the extractor then feeds at most one value, so only
                # the first name can be filled (ExtractHBaseCellsBuilder
                # .java:128-133 validation, :208-221 apply loop)
                output_fields = tuple(fd.get("output_fields", ()))
                name = fd.get("name", "")
                if not name and not output_fields:
                    raise ValueError("field needs a name or output_fields")
                if output_fields and name.endswith("*"):
                    raise ValueError("output_fields and dynamic name are exclusive")
                out.append(
                    FieldDef(name_prefix + name, family, qual, wildcard, source,
                             ftype, output_fields,
                             tuple(sorted(fd.get("params", {}).items())))
                )
            return out

        fields = parse_fields(d.get("fields", []))
        # P14 — <extract prefix=...>: a sub-document merged into the parent
        # with prefixed field names (SolrInputDocumentBuilder.java:28-58,
        # DocumentExtractDefinition.java:14-60).  The merge is a flattening
        # select, so extracts compile to prefixed FieldDefs.
        for ex in d.get("extracts", []):
            fields.extend(parse_fields(ex.get("fields", []), ex.get("prefix", "")))
        conf = IndexerConf(
            table=d["table"],
            mapping_type=d.get("mapping_type", MAPPING_ROW),
            read_row=d.get("read_row", READ_DYNAMIC),
            unique_key_field=d.get("unique_key_field", "id"),
            row_field=d.get("row_field"),
            column_family_field=d.get("column_family_field"),
            table_name_field=d.get("table_name_field"),
            unique_key_formatter=d.get("unique_key_formatter", "string"),
            fields=tuple(fields),
            mapper=d.get("mapper"),
            transform_stages=tuple(d.get("transform_stages", [])),
            variables=tuple(sorted(d.get("variables", {}).items())),
        )
        conf.validate()
        return conf

    def validate(self) -> None:
        if self.mapping_type not in (MAPPING_ROW, MAPPING_COLUMN):
            raise ValueError(f"bad mapping_type {self.mapping_type!r}")
        if self.read_row not in (READ_NEVER, READ_DYNAMIC):
            raise ValueError(f"bad read_row {self.read_row!r}")
        if self.unique_key_formatter not in ("string", "hex"):
            raise ValueError(f"bad unique_key_formatter {self.unique_key_formatter!r}")
        names = [
            n
            for f in self.fields
            for n in ((of for of in f.output_fields if of) if f.output_fields else (f.name,))
        ]
        if len(names) != len(set(names)):
            raise ValueError("duplicate field names")

    # -- pushdown surface (the analog of ResultToSolrMapper.getGet /
    #    isRelevantKV, DefaultResultToSolrMapper.java:89-126) --------------

    @property
    def table_regex(self) -> str | None:
        """'regex:pat' table expressions (IndexerConf.java:90-99)."""
        if self.table.startswith("regex:"):
            return self.table[len("regex:"):]
        return None

    def needed_families(self) -> set[str]:
        return {f.family for f in self.fields}

    def exact_targets(self) -> set[tuple[str, str]]:
        return {(f.family, f.qualifier) for f in self.fields if not f.wildcard}

    def prefix_targets(self) -> set[tuple[str, str]]:
        return {(f.family, f.qualifier) for f in self.fields if f.wildcard}

    def contains_required_data_possible(self) -> bool:
        """False if any wildcard extractor exists — a prefix extractor can
        never prove completeness (AbstractPrefixMatchingExtractor.java:89-93),
        so DYNAMIC mode must re-read/join."""
        return not any(f.wildcard for f in self.fields)


# -- XML surface (drop-in for reference users' <indexer> files) -------------

# reference formatter class names (indexerconf.xsd `unique-key-formatter`
# attr; defaults StringUniqueKeyFormatter, IndexerConf.java:74) -> engine
# formatter keys.  Bare "string"/"hex" also accepted.
_FORMATTER_CLASSES = {
    "com.ngdata.hbaseindexer.uniquekey.StringUniqueKeyFormatter": "string",
    "com.ngdata.hbaseindexer.uniquekey.HexUniqueKeyFormatter": "hex",
    "string": "string",
    "hex": "hex",
}


# literal indexerconf.xsd shape: allowed child elements and attributes per
# element (hbase-indexer-engine/src/main/resources/com/ngdata/hbaseindexer/
# conf/indexerconf.xsd; reference validates at DefaultIndexerComponentFactory
# .java:154-164 and rejects anything the schema doesn't name).
# `output-fields` is this engine's one documented extension attribute (P8).
_XSD_SHAPE = {
    "indexer": (
        {"field", "extract", "param"},
        {"table", "mapping-type", "read-row", "mapper",
         "unique-key-formatter", "unique-key-field", "row-field",
         "column-family-field", "table-name-field"},
    ),
    "field": ({"param"}, {"name", "value", "source", "type",
                          "output-fields"}),
    "extract": ({"param"}, {"prefix", "value", "source", "type",
                            "output-fields"}),
    "param": (set(), {"name", "value"}),
}


def _validate_xml_shape(el, path: str = "indexer") -> None:
    """Reject unknown elements/attributes exactly where XSD validation
    would (the reference's DefaultIndexerComponentFactory.java:154-164
    schema check) — a typo'd <filed> or mapping-typ must fail loudly,
    not silently drop config."""
    children, attrs = _XSD_SHAPE[el.tag]
    for a in el.attrib:
        if a not in attrs:
            raise ValueError(
                f"unknown attribute {a!r} on <{path}> "
                f"(indexerconf.xsd allows {sorted(attrs)})")
    for child in el:
        if child.tag not in children:
            raise ValueError(
                f"unknown element <{child.tag}> under <{path}> "
                f"(indexerconf.xsd allows {sorted(children) or 'none'})")
        _validate_xml_shape(child, f"{path}>{child.tag}")


def conf_from_xml(xml_text: str) -> IndexerConf:
    """Parse a reference-format ``<indexer>`` XML definition (the
    ``indexerconf.xsd`` surface a reference user already has on disk) into
    an :class:`IndexerConf`.

    Mapping:

    - attributes ``table / mapping-type / read-row / mapper /
      unique-key-field / row-field / column-family-field /
      table-name-field`` map 1:1 (hyphens -> underscores);
    - ``unique-key-formatter`` accepts the reference class names
      (String/HexUniqueKeyFormatter) or bare ``string``/``hex``;
    - ``<field name value source type>`` maps 1:1; the engine-extension
      attribute ``output-fields`` (comma-separated) maps to P8 positional
      output fields;
    - ``<extract prefix value type>`` maps to a prefixed sub-document
      field (P14) named after the qualifier part of ``value``;
    - indexer-level ``<param>`` elements become transform variables (P16);
      field-level ``<param>`` elements are passed to the field's custom
      value mapper (U1, the ``Configurable`` analog).
    """
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml_text)
    if root.tag != "indexer":
        raise ValueError(f"expected <indexer> root, got <{root.tag}>")
    _validate_xml_shape(root)

    def field_dict(el) -> dict:
        d = {}
        if el.get("name") is not None:
            d["name"] = el.get("name")
        if el.get("value") is not None:
            d["value"] = el.get("value")
        if el.get("source") is not None:
            d["source"] = el.get("source")
        if el.get("type") is not None:
            d["type"] = el.get("type")
        if el.get("output-fields") is not None:
            d["output_fields"] = [s.strip()
                                  for s in el.get("output-fields").split(",")]
        params = {p.get("name"): p.get("value") for p in el.findall("param")}
        if params:
            d["params"] = params
        return d

    d: dict = {"table": root.get("table")}
    if d["table"] is None:
        raise ValueError("<indexer> requires a table attribute")
    for xml_attr, key in [
        ("mapping-type", "mapping_type"), ("read-row", "read_row"),
        ("mapper", "mapper"), ("unique-key-field", "unique_key_field"),
        ("row-field", "row_field"),
        ("column-family-field", "column_family_field"),
        ("table-name-field", "table_name_field"),
    ]:
        if root.get(xml_attr) is not None:
            d[key] = root.get(xml_attr)
    fmt = root.get("unique-key-formatter")
    if fmt is not None:
        try:
            d["unique_key_formatter"] = _FORMATTER_CLASSES[fmt]
        except KeyError:
            raise ValueError(f"unknown unique-key-formatter {fmt!r}") from None

    d["fields"] = [field_dict(el) for el in root.findall("field")]
    extracts = []
    for el in root.findall("extract"):
        fd = field_dict(el)
        if "value" not in fd:
            raise ValueError("<extract> requires a value attribute")
        _, qual, wildcard = parse_field_value(fd["value"])
        fd.setdefault("name", (qual + "*") if wildcard else (qual or "content"))
        extracts.append({"prefix": el.get("prefix", ""), "fields": [fd]})
    if extracts:
        d["extracts"] = extracts
    variables = {p.get("name"): p.get("value") for p in root.findall("param")}
    if variables:
        d["variables"] = variables
    return IndexerConf.from_dict(d)


def conf_from_xml_file(path: str) -> IndexerConf:
    with open(path, encoding="utf-8") as f:
        return conf_from_xml(f.read())


def conf_to_xml(conf: IndexerConf) -> str:
    """Render an :class:`IndexerConf` as a reference-format ``<indexer>``
    document (the inverse of :func:`conf_from_xml`) — lets an engine-native
    definition be exported back into the ``indexerconf.xsd`` shape a
    reference deployment consumes.

    ``transform_stages`` have no xsd representation (they are the
    morphline file, shipped separately in the reference) and are not
    rendered; everything else round-trips:
    ``conf_from_xml(conf_to_xml(c)) == replace(c, transform_stages=())``.
    """
    import xml.etree.ElementTree as ET

    root = ET.Element("indexer", {"table": conf.table})
    defaults = IndexerConf(table=conf.table)
    for attr, xml_attr in [
        ("mapping_type", "mapping-type"), ("read_row", "read-row"),
        ("mapper", "mapper"), ("unique_key_field", "unique-key-field"),
        ("row_field", "row-field"),
        ("column_family_field", "column-family-field"),
        ("table_name_field", "table-name-field"),
        ("unique_key_formatter", "unique-key-formatter"),
    ]:
        v = getattr(conf, attr)
        if v is not None and v != getattr(defaults, attr):
            root.set(xml_attr, v)
    for f in conf.fields:
        el = ET.SubElement(root, "field", {
            "name": f.name,
            "value": f"{f.family}:{f.qualifier}{'*' if f.wildcard else ''}",
        })
        if f.source != SOURCE_VALUE:
            el.set("source", f.source)
        if f.type != "string":
            el.set("type", f.type)
        if f.output_fields:
            el.set("output-fields", ",".join(f.output_fields))
        for k, v in f.params:
            ET.SubElement(el, "param", {"name": k, "value": str(v)})
    for k, v in conf.variables:
        ET.SubElement(root, "param", {"name": k, "value": str(v)})
    return ET.tostring(root, encoding="unicode")
