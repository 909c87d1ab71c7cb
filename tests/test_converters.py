import pytest
from pyspark.sql import functions as F

from py_stringsimjoin_spark import WhitespaceTokenizer, jaccard_join
from py_stringsimjoin_spark.functions.converters import dataframe_column_to_str


def test_int_column(spark):
    df = spark.createDataFrame([(1, 1989), (2, None)], "id int, y int")
    out = {r["id"]: r["y"] for r in dataframe_column_to_str(df, "y").collect()}
    assert out == {1: "1989", 2: None}


def test_float_column_int_valued(spark):
    df = spark.createDataFrame(
        [(1, 1989.0), (2, 21.5), (3, None), (4, float("nan"))],
        "id int, y double",
    )
    out = {r["id"]: r["y"] for r in dataframe_column_to_str(df, "y").collect()}
    assert out[1] == "1989"  # int-valued float renders without .0
    assert out[2] == "21.5"
    assert out[3] is None
    assert out[4] is None  # NaN preserved as missing


def test_join_on_numeric_attr_via_converter(spark, person_tables):
    A, B = person_tables
    A2 = dataframe_column_to_str(A, "birth_year", "birth_year_str")
    B2 = dataframe_column_to_str(B, "birth_year", "birth_year_str")
    from py_stringsimjoin_spark import QgramTokenizer

    out = jaccard_join(
        A2, B2, "ID", "ID", "birth_year_str", "birth_year_str",
        QgramTokenizer(qval=2, return_set=True), 0.99,
    )
    got = {(r["l_ID"], r["r_ID"]) for r in out.collect()}
    # exact same years must match (a1 1989 == b2 1989 etc.)
    assert ("a1", "b2") in got
    assert ("a3", "b4") in got


def test_series_to_str_parity():
    import numpy as np
    import pandas as pd
    import pytest as _pytest

    from py_stringsimjoin_spark.functions.converters import series_to_str

    # int-like float column (+NaN): ints render without '.0'
    out = series_to_str(pd.Series([1989.0, np.nan, 26.0]))
    assert out[0] == "1989" and pd.isnull(out[1]) and out[2] == "26"
    # genuinely mixed float column: reference keeps the float rendering
    out = series_to_str(pd.Series([1989.0, np.nan, 21.5]))
    assert out[0] == "1989.0" and pd.isnull(out[1]) and out[2] == "21.5"
    assert series_to_str(pd.Series([1, 2])).tolist() == ["1", "2"]
    obj = pd.Series(["a", "b"])
    assert series_to_str(obj, inplace=True) is True
    assert series_to_str(pd.Series([], dtype=float)).dtype == object
    with _pytest.raises(AssertionError):
        series_to_str([1, 2])
