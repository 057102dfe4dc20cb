"""Label sinks: DIMACS-challenge text roundtrip (A8 / M8)."""

from comm_detect_spark.sources.sinks import read_labels_text, write_labels_text


def test_labels_text_roundtrip(spark, tmp_path):
    state = spark.createDataFrame(
        [(2, 7), (0, 5), (1, 5)], "vid BIGINT, label BIGINT"
    )
    path = str(tmp_path / "labels.txt")
    write_labels_text(state, path)
    assert open(path).read() == "5\n5\n7\n"
    back = read_labels_text(spark, path)
    assert sorted(map(tuple, back.collect())) == [(0, 5), (1, 5), (2, 7)]
