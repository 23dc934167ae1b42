"""XML indexer-definition parsing (the reference's indexerconf.xsd surface,
so a reference user's <indexer> files are drop-in)."""

import pytest
from pyspark.sql import functions as F

from hbase_indexer_spark.config.indexer_conf import (
    IndexerConf,
    conf_from_xml,
)

USER_XML = """<?xml version="1.0"?>
<indexer table="indexdemo-user">
  <field name="firstname_s" value="info:firstname"/>
  <field name="lastname_s" value="info:lastname"/>
  <field name="age_i" value="info:age" type="int"/>
</indexer>
"""

MESSAGE_XML = """<?xml version="1.0"?>
<indexer table="indexdemo-message"
         mapping-type="column"
         unique-key-formatter="com.ngdata.hbaseindexer.uniquekey.HexUniqueKeyFormatter">
  <field name="content" value="content:*" type="string"/>
</indexer>
"""


def test_row_mode_defaults_match_dict_form():
    conf = conf_from_xml(USER_XML)
    expect = IndexerConf.from_dict({
        "table": "indexdemo-user",
        "fields": [
            {"name": "firstname_s", "value": "info:firstname"},
            {"name": "lastname_s", "value": "info:lastname"},
            {"name": "age_i", "value": "info:age", "type": "int"},
        ],
    })
    assert conf == expect
    assert conf.mapping_type == "row"
    assert conf.read_row == "dynamic"
    assert conf.unique_key_field == "id"
    assert conf.unique_key_formatter == "string"


def test_column_mode_formatter_class_name():
    conf = conf_from_xml(MESSAGE_XML)
    assert conf.mapping_type == "column"
    assert conf.unique_key_formatter == "hex"
    (fd,) = conf.fields
    assert (fd.family, fd.qualifier, fd.wildcard) == ("content", "", True)


def test_all_attributes_and_params():
    conf = conf_from_xml("""
        <indexer table="regex:t-.*" mapping-type="column" read-row="never"
                 unique-key-field="key" row-field="row_s"
                 column-family-field="cf_s" table-name-field="tbl_s"
                 unique-key-formatter="hex">
          <param name="morphlineVariable.x" value="1"/>
          <field name="v" value="f:q">
            <param name="sep" value=";"/>
          </field>
        </indexer>
    """)
    assert conf.table_regex == "t-.*"
    assert conf.read_row == "never"
    assert conf.row_field == "row_s"
    assert conf.variables == (("morphlineVariable.x", "1"),)
    (fd,) = conf.fields
    assert fd.params == (("sep", ";"),)


def test_extract_prefix_maps_to_p14():
    conf = conf_from_xml("""
        <indexer table="t">
          <field name="a" value="f:a"/>
          <extract prefix="doc_" value="f:blob" type="string"/>
        </indexer>
    """)
    names = [f.name for f in conf.fields]
    assert names == ["a", "doc_blob"]


def test_errors():
    with pytest.raises(ValueError, match="unknown unique-key-formatter"):
        conf_from_xml('<indexer table="t" unique-key-formatter="bogus"/>')
    with pytest.raises(ValueError, match="table"):
        conf_from_xml("<indexer/>")
    with pytest.raises(ValueError, match="expected <indexer>"):
        conf_from_xml("<other/>")


def test_custom_mapper_with_params_runs(spark):
    # the reference's CSV-mapper IT (IndexerIT.java:678-721) analog: a
    # registered mapper configured via <param>, applied through the XML conf
    from hbase_indexer_spark.functions.bytes_codec import register_value_mapper
    from hbase_indexer_spark.operators.extraction import row_documents

    register_value_mapper(
        "csv", lambda col, params: F.split(col.cast("string"), params["sep"]))
    conf = conf_from_xml("""
        <indexer table="t" read-row="never">
          <field name="parts" value="f:data" type="csv">
            <param name="sep" value=";"/>
          </field>
        </indexer>
    """)
    cells = spark.createDataFrame(
        [("t", "r1", "f", "data", 1, "put", bytearray(b"a;b;c"))],
        "table string, row string, family string, qualifier string, "
        "ts long, op string, value binary",
    )
    rows = row_documents(cells, conf).collect()
    assert rows[0]["parts"] == ["a", "b", "c"]


def test_xml_rejects_unknown_elements_and_attributes():
    """Literal XSD-shape validation (DefaultIndexerComponentFactory
    .java:154-164): typos fail loudly instead of silently dropping."""
    import pytest

    from hbase_indexer_spark.config.indexer_conf import conf_from_xml

    with pytest.raises(ValueError, match="unknown element"):
        conf_from_xml(
            '<indexer table="t"><filed name="a" value="f:q"/></indexer>')
    with pytest.raises(ValueError, match="unknown attribute"):
        conf_from_xml('<indexer table="t" mapping-typ="row"/>')
    with pytest.raises(ValueError, match="unknown attribute"):
        conf_from_xml(
            '<indexer table="t"><field nam="a" value="f:q"/></indexer>')
    with pytest.raises(ValueError, match="unknown element"):
        conf_from_xml(
            '<indexer table="t"><param name="a" value="b">'
            '<field name="x" value="f:q"/></param></indexer>')
    # the valid surface still parses
    conf = conf_from_xml(
        '<indexer table="t"><field name="a" value="f:q" type="int">'
        '<param name="k" value="v"/></field></indexer>')
    assert conf.fields[0].name == "a"
