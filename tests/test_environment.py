"""SQL-client environment files (environment.py) — Environment.java +
conf/sql-client-defaults.yaml parity: tables (source/sink/view) and
functions registered from YAML into an Engine; views resolve in file
order; 'from: class' functions refuse loudly."""

from __future__ import annotations

import os

import pytest

from flink_1_8_sourcecode_spark.descriptors import ValidationException
from flink_1_8_sourcecode_spark.engine import Engine
from flink_1_8_sourcecode_spark.environment import load_environment


def env_upper(s):
    return None if s is None else s.upper()


@pytest.fixture()
def eng(spark):
    return Engine(spark)


def _csv_dir(tmp_path, name, lines):
    d = tmp_path / name
    d.mkdir()
    with open(d / "part.csv", "w") as f:
        f.write("\n".join(lines) + "\n")
    return str(d)


ENV_TMPL = """
tables:
  - name: people
    type: source-table
    schema:
      - name: id
        type: INT
      - name: city
        type: VARCHAR
    connector:
      type: filesystem
      path: "{src}"
    format:
      type: csv
      fields:
        - name: id
          type: INT
        - name: city
          type: VARCHAR
      field-delimiter: "|"
  - name: big_ids
    type: view
    query: SELECT id, envUpper(city) AS city FROM people WHERE id > 1
  - name: second_view
    type: view
    query: SELECT count(*) AS n FROM big_ids
  - name: out_sink
    type: sink-table
    schema:
      - name: id
        type: INT
      - name: city
        type: VARCHAR
    connector:
      type: filesystem
      path: "{snk}"
    format:
      type: csv
      fields:
        - name: id
          type: INT
        - name: city
          type: VARCHAR

functions:
  - name: envUpper
    from: python
    callable: tests.test_environment.env_upper
    returns: string
"""


class TestLoad:
    def test_full_environment(self, eng, spark, tmp_path):
        src = _csv_dir(tmp_path, "people_src", ["1|oslo", "2|lima", "3|pune"])
        snk = str(tmp_path / "env_sink")
        os.makedirs(snk, exist_ok=True)
        yml = ENV_TMPL.format(src=src, snk=snk)
        summary = load_environment(eng, yml)
        assert summary == {
            "sources": ["people"],
            "sinks": ["out_sink"],
            "views": ["big_ids", "second_view"],
            "functions": ["envUpper"],
        }
        # source scan with declared schema
        got = sorted(map(tuple, eng.table("people").collect()))
        assert got == [(1, "oslo"), (2, "lima"), (3, "pune")]
        # views resolve in order, UDF applied
        assert sorted(
            map(tuple, eng.sql("SELECT * FROM big_ids").collect())
        ) == [(2, "LIMA"), (3, "PUNE")]
        assert eng.sql("SELECT n FROM second_view").collect()[0]["n"] == 2
        # sink registered: insert + read back
        eng.insert_into(eng.table("people"), "out_sink")
        assert eng.read_sink("out_sink").count() == 3

    def test_file_path_input(self, eng, spark, tmp_path):
        src = _csv_dir(tmp_path, "fp_src", ["7|rome"])
        p = tmp_path / "env.yaml"
        p.write_text(
            "tables:\n"
            "  - name: fp_tbl\n"
            "    type: source\n"  # back-compat spelling
            "    schema:\n"
            "      - name: id\n        type: INT\n"
            "      - name: city\n        type: VARCHAR\n"
            "    connector:\n"
            f"      type: filesystem\n      path: \"{src}\"\n"
            "    format:\n"
            "      type: csv\n"
            "      fields:\n"
            "        - name: id\n          type: INT\n"
            "        - name: city\n          type: VARCHAR\n"
            "      field-delimiter: \"|\"\n"
        )
        summary = load_environment(eng, str(p))
        assert summary["sources"] == ["fp_tbl"]
        assert eng.table("fp_tbl").count() == 1

    def test_streaming_execution_builds_stream(self, eng, spark, tmp_path):
        src = _csv_dir(tmp_path, "st_src", ["1|a"])
        env = {
            "execution": {"type": "streaming"},
            "tables": [
                {
                    "name": "st_tbl",
                    "type": "source-table",
                    "schema": [
                        {"name": "id", "type": "INT"},
                        {"name": "s", "type": "VARCHAR"},
                    ],
                    "connector": {"type": "filesystem", "path": src},
                    "format": {
                        "type": "csv",
                        "fields": [
                            {"name": "id", "type": "INT"},
                            {"name": "s", "type": "VARCHAR"},
                        ],
                        "field-delimiter": "|",
                    },
                }
            ],
        }
        load_environment(eng, env)
        assert eng.table("st_tbl").isStreaming


class TestErrors:
    def test_class_function_refused(self, eng):
        with pytest.raises(NotImplementedError, match="from: class"):
            load_environment(
                eng,
                {"functions": [{"name": "f", "from": "class",
                                "class": "com.example.F"}]},
            )

    def test_unknown_connector(self, eng):
        with pytest.raises(ValidationException, match="connector type"):
            load_environment(
                eng,
                {"tables": [{
                    "name": "t", "type": "source-table",
                    "schema": [{"name": "a", "type": "INT"}],
                    "connector": {"type": "kafka"},
                    "format": {"type": "csv",
                               "fields": [{"name": "a", "type": "INT"}]},
                }]},
            )

    def test_view_needs_query(self, eng):
        with pytest.raises(ValidationException, match="query"):
            load_environment(eng, {"tables": [{"name": "v", "type": "view"}]})

    def test_unknown_table_type(self, eng):
        with pytest.raises(ValidationException, match="unknown table type"):
            load_environment(
                eng, {"tables": [{"name": "t", "type": "wat"}]}
            )

    def test_bad_top_level(self, eng):
        with pytest.raises(ValidationException, match="top level"):
            load_environment(eng, "just a string")
