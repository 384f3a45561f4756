"""CLI smoke tests."""

import numpy as np
import pytest

from bpldenoising_tpu.__main__ import main


@pytest.fixture(autouse=True)
def in_tmp(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)


def test_scalar_tv(capsys):
    main(["scalar-tv", "--dataset", "circle", "--maxiter", "2",
          "--inner-maxiter", "200"])
    out = capsys.readouterr().out
    assert "x =" in out and "cost =" in out


def test_validate_tv(capsys):
    main(["validate-tv", "0.1", "--dataset", "circle"])
    assert len(capsys.readouterr().out.split()) == 2


def test_cost_sweep(tmp_path):
    import os
    main(["cost-sweep", "--dataset", "circle", "--points", "3",
          "--maxiter", "100", "--plot"])
    assert os.path.exists("output/circle_128_10/circle_128_10_cost.npz")


def test_bad_command_exits():
    with pytest.raises(SystemExit):
        main(["not-a-command"])


def test_trace_flag_writes_profile(tmp_path):
    import os
    main(["scalar-tv", "--dataset", "circle", "--maxiter", "1",
          "--inner-maxiter", "100", "--trace", str(tmp_path / "tr")])
    assert os.path.isdir(tmp_path / "tr")
    assert any((tmp_path / "tr").rglob("*"))   # profiler wrote artifacts


def test_make_dataset_cli(tmp_path, capsys):
    import os
    main(["make-dataset", "clicircle_32_10", "--size", "32",
          "--sigma", "0.1", "--out-root", str(tmp_path / "ds")])
    out_dir = capsys.readouterr().out.strip()
    assert os.path.isfile(os.path.join(out_dir, "filelist.txt"))
    from bpldenoising_tpu.data import load_dataset
    tru, noisy = load_dataset(out_dir)
    assert tru.shape == noisy.shape == (1, 32, 32)
    # the written pair feeds straight into the learning stack
    main(["make-dataset", "cliext_8_0", "--from-images",
          os.path.join(out_dir, "clicircle_32_10_true_1.png"),
          "--out-root", str(tmp_path / "ds2")])


def test_single_loop_budget_flags(capsys):
    main(["scalar-tv", "--dataset", "circle", "--method", "single_loop",
          "--sl-outer", "5", "--sl-inner", "10", "--sl-adj", "3",
          "--sl-lr", "0.05"])
    out = capsys.readouterr().out
    assert "iterations = 5" in out
