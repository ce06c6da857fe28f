"""grph-doctor health checks run clean in a healthy environment."""


def test_doctor_passes(capsys):
    from graphphysics_tpu.cli.doctor import main

    rc = main(["--skip-probes"])  # probes covered by their own unit below
    out = capsys.readouterr().out
    assert rc == 0
    assert "all checks passed" in out
    assert "train-step determinism" in out


def test_chip_probes_return_positive():
    from graphphysics_tpu.utils.profiling import (
        chip_probe_gbps,
        chip_probe_tflops,
    )

    assert chip_probe_tflops(n=512, depth=2, reps=1) > 0
    assert chip_probe_gbps(mb=8, depth=2, reps=1) > 0
