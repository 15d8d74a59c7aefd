"""Conform/cast layer tests — reference caster parity.

Recreates the reference's golden fixtures (FIXTURES.md F2/F3, from
/root/reference/tests/data/) and its conformance matrices:
bool truth table (caster.py:128-141, tests/test_pandas_parser.py:145-206),
datetime formats incl. %d-%b-%y (tests/test_pandas_parser.py:245-270),
OOB datetimes (tests/test_date_timestamp_conformance.py:86-131),
round-trip through every format pair (tests/test_round_trip.py:40-74).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from mojap_arrow_pd_parser_spark.functions.conform import (
    cast_spark_table_to_schema,
    meta_type_to_spark,
    strftime_to_spark,
)
from mojap_arrow_pd_parser_spark.sources import reader, writer
from mojap_arrow_pd_parser_spark.sources.inference import (
    human_to_bytes,
    infer_file_format,
)

ALL_TYPES_CSV = """i,my_float,my_bool,my_nullable_bool,my_date,my_datetime,my_int,my_string
1,2.5,True,True,2021-03-19,2021-03-19 12:00:00,,hello
2,3.5,True,False,2021-03-20,2021-03-20 13:30:30,2,"dsfasd,dsffadsf"
3,4.5,False,,2021-03-21,2021-03-21 14:45:45,3,💩
"""

ALL_TYPES_META = {
    "name": "all_types",
    "columns": [
        {"name": "i", "type": "int64"},
        {"name": "my_float", "type": "float64"},
        {"name": "my_bool", "type": "bool_"},
        {"name": "my_nullable_bool", "type": "bool_"},
        {"name": "my_date", "type": "date32"},
        {"name": "my_datetime", "type": "timestamp(s)"},
        {"name": "my_int", "type": "int64"},
        {"name": "my_string", "type": "string"},
    ],
}


@pytest.fixture()
def all_types_path(tmp_path):
    p = tmp_path / "all_types.csv"
    p.write_text(ALL_TYPES_CSV, encoding="utf-8")
    return str(p)


class TestMetaTypes:
    @pytest.mark.parametrize(
        "meta_t,spark_t",
        [
            ("int8", T.ByteType()), ("int64", T.LongType()),
            ("uint32", T.LongType()), ("uint64", T.DecimalType(20, 0)),
            ("float64", T.DoubleType()), ("decimal128(5,3)", T.DecimalType(5, 3)),
            ("bool_", T.BooleanType()), ("string", T.StringType()),
            ("date32", T.DateType()), ("timestamp(ms)", T.TimestampType()),
            ("list<int64>", T.ArrayType(T.LongType())),
            ("large_list<int64>", T.ArrayType(T.LongType())),
            ("struct<a:int64,b:string>",
             T.StructType([T.StructField("a", T.LongType()),
                           T.StructField("b", T.StringType())])),
        ],
    )
    def test_mapping(self, meta_t, spark_t):
        assert meta_type_to_spark(meta_t) == spark_t

    def test_strftime(self):
        assert strftime_to_spark("%Y-%m-%d") == "yyyy-MM-dd"
        assert strftime_to_spark("%d-%b-%y") == "dd-MMM-yy"
        assert strftime_to_spark("%d/%m/%Y") == "dd/MM/yyyy"
        with pytest.raises(ValueError):
            strftime_to_spark("%Q")


class TestAllTypesConformance:
    def test_read_with_meta(self, spark, all_types_path):
        df = reader.read(spark, all_types_path, metadata=ALL_TYPES_META)
        assert [f.dataType for f in df.schema.fields] == [
            T.LongType(), T.DoubleType(), T.BooleanType(), T.BooleanType(),
            T.DateType(), T.TimestampType(), T.LongType(), T.StringType(),
        ]
        rows = df.orderBy("i").collect()
        assert rows[0].my_int is None  # null int (int_type.csv row 1 spirit)
        assert rows[0].my_bool is True
        assert rows[2].my_nullable_bool is None  # empty -> null bool
        assert rows[1].my_string == 'dsfasd,dsffadsf'
        assert rows[2].my_string == "💩"
        assert rows[0].my_date == dt.date(2021, 3, 19)
        assert rows[1].my_datetime == dt.datetime(2021, 3, 20, 13, 30, 30)

    def test_missing_column_raises(self, spark, all_types_path):
        meta = {"columns": ALL_TYPES_META["columns"] + [{"name": "ghost", "type": "int64"}]}
        with pytest.raises(ValueError, match="ghost"):
            reader.read(spark, all_types_path, metadata=meta)

    def test_partial_schema_ok(self, spark, all_types_path):
        meta = {"columns": ALL_TYPES_META["columns"] + [{"name": "ghost", "type": "int64"}]}
        df = reader.read(spark, all_types_path, metadata=meta, expect_full_schema=False)
        assert "ghost" not in df.columns

    def test_nrows_limit(self, spark, all_types_path):
        """Facade ``nrows`` passthrough (reference README.md:70 passes
        nrows to pandas) -> df.limit(n) after conform."""
        df = reader.read(spark, all_types_path, metadata=ALL_TYPES_META, nrows=2)
        assert df.count() == 2
        # schema still fully conformed
        assert dict(df.dtypes)["my_int"] == "bigint"

    def test_drop_and_ignore(self, spark, all_types_path):
        df = reader.read(
            spark, all_types_path, metadata=ALL_TYPES_META,
            conform_options={"drop_columns": ["my_float"], "ignore_columns": ["my_int"]},
        )
        assert "my_float" not in df.columns
        assert dict(df.dtypes)["my_int"] == "string"  # left uncast


class TestBoolTruthTable:
    TRUE_SPELLINGS = ["yes", "YES", " Yes ", "true", "TRUE", "t", "1", "1.0"]
    FALSE_SPELLINGS = ["no", "No ", "false", "FALSE", "f", "0", "0.0"]

    def _conform(self, spark, values, **kw):
        df = spark.createDataFrame([(v,) for v in values], "b string")
        meta = {"columns": [{"name": "b", "type": "bool_"}]}
        return [
            r.b
            for r in cast_spark_table_to_schema(df, meta, **kw).collect()
        ]

    def test_true_false_null(self, spark):
        got = self._conform(
            spark, self.TRUE_SPELLINGS + self.FALSE_SPELLINGS + ["", None]
        )
        assert got == [True] * 8 + [False] * 7 + [None, None]

    def test_custom_bool_map(self, spark):
        got = self._conform(
            spark, ["Y", "N"], bool_map={"y": True, "n": False}
        )
        assert got == [True, False]

    def test_unmapped_raises(self, spark):
        with pytest.raises(Exception, match="unmapped value"):
            self._conform(spark, ["maybe"])

    def test_unmapped_coerces(self, spark):
        assert self._conform(spark, ["maybe"], bool_errors="coerce") == [None]

    def test_numeric_source(self, spark):
        df = spark.createDataFrame([(1,), (0,), (None,)], "b int")
        meta = {"columns": [{"name": "b", "type": "bool_"}]}
        got = [r.b for r in cast_spark_table_to_schema(df, meta).collect()]
        assert got == [True, False, None]

    def test_unmapped_numeric_honors_policy(self, spark):
        # reference maps stringified numerics through the truth table:
        # 2 / -3.5 are NOT booleans (Spark's cast would say true)
        df = spark.createDataFrame([(2,), (1,)], "b int")
        meta = {"columns": [{"name": "b", "type": "bool_"}]}
        with pytest.raises(Exception, match="unmapped value"):
            cast_spark_table_to_schema(df, meta).collect()
        dff = spark.createDataFrame([(-3.5,), (1.0,), (0.0,)], "b double")
        got = [
            r.b
            for r in cast_spark_table_to_schema(
                dff, meta, bool_errors="coerce"
            ).collect()
        ]
        assert got == [None, True, False]


class TestCollectAllErrors:
    """Reference parity: raise mode that gathers EVERY bad value
    (caster.py:219-236 'N values could not be cast ... Details: [...]'),
    mirroring /root/reference/tests/test_pandas_parser.py:145-206."""

    META = {
        "columns": [
            {"name": "b", "type": "bool_"},
            {"name": "n", "type": "int64"},
            {"name": "d", "type": "timestamp(ms)"},
        ]
    }

    def _df(self, spark):
        rows = [
            ("yes", "1", "2024-01-01 00:00:00"),
            ("apple", "x", "not-a-date"),
            ("pear", "2", "2024-01-02 00:00:00"),
            ("no", "y", "also-bad"),
        ]
        return spark.createDataFrame(rows, "b string, n string, d string")

    def test_collects_every_bad_value_per_column(self, spark):
        from mojap_arrow_pd_parser_spark.functions.conform import collect_cast_errors

        errs = collect_cast_errors(self._df(spark), self.META)
        assert errs["b"]["n_bad"] == 2 and errs["b"]["sample"] == ["apple", "pear"]
        assert errs["n"]["n_bad"] == 2 and errs["n"]["sample"] == ["x", "y"]
        assert errs["d"]["n_bad"] == 2 and set(errs["d"]["sample"]) == {
            "also-bad", "not-a-date",
        }

    def test_raise_all_policy_names_all_columns(self, spark):
        with pytest.raises(ValueError) as ei:
            cast_spark_table_to_schema(
                self._df(spark), self.META,
                num_errors="raise_all", bool_errors="raise_all",
                datetime_errors="raise_all",
            )
        msg = str(ei.value)
        assert "'b'" in msg and "'n'" in msg and "'d'" in msg
        assert "apple" in msg and "pear" in msg and "2 values" in msg

    def test_raise_all_clean_data_passes(self, spark):
        df = spark.createDataFrame(
            [("yes", "1", "2024-01-01 00:00:00")], "b string, n string, d string"
        )
        out = cast_spark_table_to_schema(
            df, self.META, num_errors="raise_all", bool_errors="raise_all",
            datetime_errors="raise_all",
        ).collect()
        assert out[0].b is True and out[0].n == 1


class TestDowngradeAndMerge:
    def test_string_date_downgrade_keeps_string(self, spark):
        # C12: reference validate_arrow_schema keeps string->date32
        # columns as string instead of erroring
        df = spark.createDataFrame([("2024-01-01",), ("oops",)], "d string")
        meta = {"columns": [{"name": "d", "type": "date32"}]}
        out = cast_spark_table_to_schema(df, meta, datetime_errors="downgrade")
        assert dict(out.dtypes)["d"] == "string"
        assert [r.d for r in out.collect()] == ["2024-01-01", "oops"]

    def test_timestamp_downgrade_still_converts(self, spark):
        df = spark.createDataFrame([("2024-01-01 00:00:00",)], "t string")
        meta = {"columns": [{"name": "t", "type": "timestamp(ms)"}]}
        out = cast_spark_table_to_schema(df, meta, datetime_errors="downgrade")
        assert dict(out.dtypes)["t"] == "timestamp"

    def test_update_existing_metadata_merge_order(self):
        from mojap_arrow_pd_parser_spark.functions.conform import (
            update_existing_metadata,
        )

        current = {
            "columns": [
                {"name": "a", "type": "int64"},
                {"name": "b", "type": "string"},
                {"name": "c", "type": "bool_"},
            ]
        }
        new = {
            "columns": [
                {"name": "b", "type": "float64"},       # update wins
                {"name": "z", "type": "string"},        # new-only: ignored
            ]
        }
        merged = update_existing_metadata(current, new)
        assert [c["name"] for c in merged["columns"]] == ["a", "b", "c"]
        assert merged["columns"][1]["type"] == "float64"
        assert merged["columns"][0]["type"] == "int64"


class TestTimestamps:
    def test_custom_formats(self, spark):
        df = spark.createDataFrame(
            [("16-Aug-2026", "16-Aug-26", "16/08/2026")],
            "datelong string, dateshort string, date_uk string",
        )
        meta = {
            "columns": [
                {"name": "datelong", "type": "timestamp(s)", "datetime_format": "%d-%b-%Y"},
                {"name": "dateshort", "type": "timestamp(s)", "datetime_format": "%d-%b-%y"},
                {"name": "date_uk", "type": "date32", "datetime_format": "%d/%m/%Y"},
            ]
        }
        r = cast_spark_table_to_schema(df, meta).collect()[0]
        assert r.datelong == dt.datetime(2026, 8, 16)
        assert r.dateshort == dt.datetime(2026, 8, 16)
        assert r.date_uk == dt.date(2026, 8, 16)

    def test_out_of_bounds_datetimes(self, spark):
        """years 1000 & 2262+ — outside pandas-ns range, fine for Spark
        (datetime_type_oob.csv, test_date_timestamp_conformance.py:86-131)."""
        vals = ["1000-01-01 00:00:00", "1677-09-22 00:00:00", "",
                "2262-04-11 23:47:17", "9999-12-31 23:59:59"]
        df = spark.createDataFrame([(v,) for v in vals], "ts string")
        meta = {"columns": [{"name": "ts", "type": "timestamp(s)"}]}
        got = [r.ts for r in cast_spark_table_to_schema(df, meta).collect()]
        assert got[0] == dt.datetime(1000, 1, 1)
        assert got[2] is None
        assert got[4] == dt.datetime(9999, 12, 31, 23, 59, 59)

    def test_date_only_string_in_timestamp_col(self, spark):
        df = spark.createDataFrame([("2021-01-01",)], "ts string")
        meta = {"columns": [{"name": "ts", "type": "timestamp(s)"}]}
        got = cast_spark_table_to_schema(df, meta).collect()[0].ts
        assert got == dt.datetime(2021, 1, 1)

    def test_bad_raises_vs_coerce(self, spark):
        df = spark.createDataFrame([("not a date",)], "ts string")
        meta = {"columns": [{"name": "ts", "type": "timestamp(s)"}]}
        with pytest.raises(Exception, match="[Ee]rror converting"):
            cast_spark_table_to_schema(df, meta).collect()
        got = cast_spark_table_to_schema(df, meta, datetime_errors="coerce").collect()
        assert got[0].ts is None


class TestNumericPolicies:
    def test_coerce_and_raise(self, spark):
        df = spark.createDataFrame([("12",), ("oops",)], "x string")
        meta = {"columns": [{"name": "x", "type": "int64"}]}
        got = cast_spark_table_to_schema(df, meta, num_errors="coerce").orderBy("x").collect()
        assert sorted([r.x for r in got], key=lambda v: (v is None, v)) == [12, None]
        with pytest.raises(Exception, match="[Ee]rror converting"):
            cast_spark_table_to_schema(df, meta, num_errors="raise").collect()

    def test_per_column_policy(self, spark):
        df = spark.createDataFrame([("1", "oops")], "a string, b string")
        meta = {"columns": [{"name": "a", "type": "int64"}, {"name": "b", "type": "int64"}]}
        got = cast_spark_table_to_schema(
            df, meta, num_errors={"b": "coerce"}
        ).collect()[0]
        assert got.a == 1 and got.b is None

    def test_uint64_widening(self, spark):
        """uint64 has no Spark integer home -> DECIMAL(20,0) carries the
        full range (SURVEY §1.2 unsigned-widening row)."""
        from decimal import Decimal

        df = spark.createDataFrame([("18446744073709551615",), ("0",)], "u string")
        meta = {"columns": [{"name": "u", "type": "uint64"}]}
        got = sorted(
            r.u for r in cast_spark_table_to_schema(df, meta).collect()
        )
        assert got == [Decimal("0"), Decimal("18446744073709551615")]

    def test_decimal(self, spark):
        from decimal import Decimal

        df = spark.createDataFrame([("12",), ("12.3",), ("12.34",)], "d string")
        meta = {"columns": [{"name": "d", "type": "decimal128(5,3)"}]}
        got = [r.d for r in cast_spark_table_to_schema(df, meta).collect()]
        assert got == [Decimal("12.000"), Decimal("12.300"), Decimal("12.340")]


class TestFormatInference:
    @pytest.mark.parametrize(
        "path,fmt",
        [
            ("a/b/file.csv", "csv"), ("file.csv.gz", "csv"),
            ("file.jsonl", "json"), ("file.ndjson", "json"),
            ("FILE.SNAPPY.PARQUET", "parquet"), ("x.parquet", "parquet"),
            ("data.tsv.zip", "csv"),
        ],
    )
    def test_paths(self, path, fmt):
        assert infer_file_format(path) == fmt

    def test_conflict_path_wins_with_warning(self):
        # reference contract: path-derived format silently wins a
        # conflict (tests/test_utils.py test_conflict_infer_from_both)
        with pytest.warns(UserWarning, match="conflict"):
            assert infer_file_format("x.csv", {"file_format": "parquet"}) == "csv"

    def test_meta_fallback(self):
        assert infer_file_format("noext", {"file_format": "jsonl"}) == "json"
        with pytest.raises(ValueError):
            infer_file_format("noext")

    def test_human_to_bytes(self):
        assert human_to_bytes("2.5GB") == int(2.5 * 2**30)
        assert human_to_bytes("500 MB") == 500 * 2**20
        assert human_to_bytes(1024) == 1024


class TestCsvDialect:
    """csv_options fixture (F3): ';' delimiter, "'" quote, '\\' escape,
    custom null string — the reference's CSV dialect passthrough
    (tests/test_str_conformance.py:30-65)."""

    def test_dialect_options(self, spark, tmp_path):
        p = tmp_path / "dialect.csv"
        p.write_text(
            "i;my_string\n"
            "1;'semi;colon'\n"
            "2;NULL_STRING\n"
            "3;'it\\'s quoted'\n",
            encoding="utf-8",
        )
        meta = {"columns": [{"name": "i", "type": "int64"},
                            {"name": "my_string", "type": "string"}]}
        df = reader.read(
            spark, str(p), metadata=meta,
            sep=";", quote="'", escape="\\", nullValue="NULL_STRING",
        )
        rows = {r.i: r.my_string for r in df.collect()}
        assert rows == {1: "semi;colon", 2: None, 3: "it's quoted"}


FORMATS = ["csv", "json", "parquet"]


class TestRoundTripMatrix:
    """The reference's flagship (tests/test_round_trip.py:40-74): write ->
    read through every format pair, final == original."""

    @pytest.fixture(scope="class")
    def original(self, spark):
        rows = [
            Row(i=1, my_float=2.5, my_bool=True, my_nullable_bool=True,
                my_date=dt.date(2021, 3, 19), my_datetime=dt.datetime(2021, 3, 19, 12, 0, 0),
                my_int=None, my_string="hello"),
            Row(i=2, my_float=3.5, my_bool=True, my_nullable_bool=False,
                my_date=dt.date(2021, 3, 20), my_datetime=dt.datetime(2021, 3, 20, 13, 30, 30),
                my_int=2, my_string='dsfasd,"dsffadsf'),
            Row(i=3, my_float=4.5, my_bool=False, my_nullable_bool=None,
                my_date=dt.date(2021, 3, 21), my_datetime=dt.datetime(2021, 3, 21, 14, 45, 45),
                my_int=3, my_string="💩"),
        ]
        from mojap_arrow_pd_parser_spark.functions.conform import metadata_to_spark_schema

        return spark.createDataFrame(rows, metadata_to_spark_schema(ALL_TYPES_META))

    @pytest.mark.parametrize("fmt1", FORMATS)
    @pytest.mark.parametrize("fmt2", FORMATS)
    def test_pair(self, spark, original, tmp_path, fmt1, fmt2):
        p1 = str(tmp_path / f"step1.{fmt1}")
        p2 = str(tmp_path / f"step2.{fmt2}")
        writer.write(original, p1, file_format=fmt1)
        mid = reader.read(spark, p1, metadata=ALL_TYPES_META, file_format=fmt1)
        writer.write(mid, p2, file_format=fmt2)
        final = reader.read(spark, p2, metadata=ALL_TYPES_META, file_format=fmt2)
        assert sorted(final.collect()) == sorted(original.collect())

    def test_arrow_csv_writer_roundtrip(self, spark, original, tmp_path):
        """K8: the reference ships ArrowCsvWriter as a broken stub
        (_writers.py:361-366); ours works — Arrow C++ CSV serializer
        per partition, header on every part, read back == original."""
        out = str(tmp_path / "arrow_csv")
        stringified = original.selectExpr(
            "i", "my_float", "my_bool", "my_nullable_bool",
            "cast(my_date as string) my_date",
            "date_format(my_datetime, 'yyyy-MM-dd HH:mm:ss') my_datetime",
            "my_int", "my_string",
        )
        n_parts = writer.write_csv_arrow(stringified, out)
        assert n_parts >= 1
        # arrow's CSV dialect is RFC 4180 (doubled quotes) -> escape='"'
        back = reader.read(
            spark, out, metadata=ALL_TYPES_META, file_format="csv", escape='"'
        )
        assert sorted(back.collect()) == sorted(original.collect())
