"""Reporting-lite tests."""

from __future__ import annotations

from entity_resolution_pipeline_spark.plans import reporting as R


def test_prediction_and_cluster_report(spark, tmp_path):
    preds = spark.createDataFrame(
        [("a", "b", 0.99, True), ("a", "c", 0.2, False), ("b", "c", 0.97, True)],
        ["left_id", "right_id", "probability", "match"],
    )
    clusters = spark.createDataFrame(
        [("a", 1, 3), ("b", 1, 3), ("c", 1, 3), ("d", 2, 1)],
        ["entity_id", "cluster_id", "cluster_size"],
    )
    report = R.full_report(
        {"precision": 1.0, "recall": 0.9, "f1": 0.947, "accuracy": 0.95,
         "roc_auc": 0.999, "decision_threshold": 0.8,
         "confusion_matrix": {"true_negatives": 10, "false_positives": 0,
                              "false_negatives": 1, "true_positives": 9}},
        preds,
        clusters,
    )
    assert report["predictions"]["pairs_scored"] == 3
    assert report["predictions"]["predicted_matches"] == 2
    assert report["clusters"]["n_clusters"] == 2
    assert report["clusters"]["n_entities"] == 4
    assert report["clusters"]["size_distribution"] == {"3-5": 1, "1": 1}
    md = R.to_markdown(report)
    assert "| precision | 1.0000 |" in md
    assert "| 3-5 | 1 |" in md
    R.save_report(report, str(tmp_path / "r.json"), str(tmp_path / "r.md"))
    assert (tmp_path / "r.json").exists() and (tmp_path / "r.md").exists()
