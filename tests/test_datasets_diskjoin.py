from py_stringsimjoin_spark import (
    QgramTokenizer,
    disk_edit_distance_join,
    load_books_dataset,
    load_person_dataset,
)


def test_load_person_dataset(spark):
    A, B = load_person_dataset(spark)
    assert A.count() == 7 and B.count() == 8
    assert A.columns == ["ID", "name", "birth_year", "hourly_wage", "address", "zipcode"]


def test_load_books_dataset_deterministic(spark):
    A, B = load_books_dataset(spark, n_a=50, n_b=50)
    A2, _ = load_books_dataset(spark, n_a=50, n_b=50)
    assert A.count() == 50
    assert sorted(map(tuple, A.collect())) == sorted(map(tuple, A2.collect()))
    assert A.columns[0:2] == ["ID", "Title"]


def test_disk_edit_distance_join(spark, person_tables, tmp_path):
    A, B = person_tables
    out_path = str(tmp_path / "edjoin_out")
    ok = disk_edit_distance_join(
        A, B, "ID", "ID", "name", "name", 2, out_path, output_format="csv"
    )
    assert ok is True
    back = spark.read.option("header", "true").csv(out_path)
    rows = {(r["l_ID"], r["r_ID"]) for r in back.collect()}
    assert ("a1", "b2") in rows  # Kevin Smith == Kevin Smith
    assert ("a4", "b5") in rows  # Basil/Bazil Nash, ed=1
