"""Logger CSV/plot behavior."""

import csv

from cellulus_tpu.utils.logger import get_logger


def test_logger_csv_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    logger = get_logger(["loss", "oce_loss", "val_loss"], "loss", plot_every=2)
    for i in range(5):
        logger.add("loss", float(i))
        logger.add("oce_loss", float(i) / 2)
        logger.step()
    logger.add("val_loss", 0.5)  # sparse key with fewer entries
    logger.close()

    with open(tmp_path / "loss.csv") as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["", "loss", "oce_loss", "val_loss"]
    assert len(rows) == 6  # header + 5 iterations
    assert rows[1][1] == "0.0"
    assert rows[1][3] == "0.5"
    assert rows[2][3] == ""  # sparse key padded
    assert (tmp_path / "loss.png").exists()


def test_logger_rejects_unknown_key():
    logger = get_logger(["loss"], "t")
    try:
        logger.add("nope", 1.0)
        raise AssertionError("expected KeyError")
    except KeyError:
        pass
