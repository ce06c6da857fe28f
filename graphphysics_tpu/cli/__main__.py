"""Combined ``grph`` console entry point (reference ``setup.py:6`` exposes
``grph=graphphysics.train:main``; here ``grph train ...`` / ``grph predict
...`` dispatch to the two CLIs, and bare flags default to train for
drop-in compatibility)."""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "predict":
        from graphphysics_tpu.cli.predict import main as predict_main

        return predict_main(argv[1:])
    if argv and argv[0] == "doctor":
        from graphphysics_tpu.cli.doctor import main as doctor_main

        return doctor_main(argv[1:])
    if argv and argv[0] == "export":
        from graphphysics_tpu.cli.export import main as export_main

        return export_main(argv[1:])
    if argv and argv[0] == "train":
        argv = argv[1:]
    from graphphysics_tpu.cli.train import main as train_main

    return train_main(argv)


if __name__ == "__main__":
    raise SystemExit(main())
