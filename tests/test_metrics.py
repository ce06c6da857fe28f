"""Metrics utilities: meter statistics and CSV logger header evolution."""

import csv

import numpy as np

from graphphysics_tpu.utils.metrics import AverageValueMeter, CSVMetricsLogger


def test_average_value_meter(rng):
    m = AverageValueMeter()
    vals = rng.normal(size=100)
    for v in vals:
        m.add(float(v))
    mean, std = m.value()
    np.testing.assert_allclose(mean, vals.mean(), rtol=1e-6)
    np.testing.assert_allclose(std, vals.std(ddof=1), rtol=1e-5)


def test_csv_logger_header_growth_and_resume(tmp_path):
    path = str(tmp_path / "m.csv")
    log = CSVMetricsLogger(path)
    log.log(0, 1, {"train_loss": 1.0})
    log.log(0, 2, {"train_loss": 0.9, "val_rmse": 0.5})  # header widens
    rows = list(csv.DictReader(open(path)))
    assert rows[0]["train_loss"] == "1.0"
    assert rows[0]["val_rmse"] == ""  # earlier row backfilled under new header
    assert rows[1]["val_rmse"] == "0.5"

    # resume: a fresh logger adopts the existing header, no duplicate header
    log2 = CSVMetricsLogger(path)
    log2.log(1, 3, {"train_loss": 0.8})
    lines = open(path).read().strip().splitlines()
    assert sum(1 for l in lines if l.startswith("time,")) == 1
    rows = list(csv.DictReader(open(path)))
    assert len(rows) == 3 and rows[2]["epoch"] == "1"
