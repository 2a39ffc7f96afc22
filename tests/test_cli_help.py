"""Every CLI's --help must render.

Regression: cli.train --help crashed with TypeError for two rounds because
a help string contained a bare '%' ("~30% faster"), which argparse
interpolates against its params dict at FORMAT time — invisible to every
functional test (none render help) and fatal to the first real user who
asks for usage. The reference's CLI surface is argparse help
(train_models.py:15-22), so help rendering IS part of the parity surface.
"""

import importlib

import pytest

CLIS = [
    "prepare_data",
    "extract_features",
    "train",
    "evaluate",
    "predict",
    "serve",
    "export_serving",
    "build_glove",
]


@pytest.mark.parametrize("name", CLIS)
def test_cli_help_renders(name, capsys):
    mod = importlib.import_module(
        f"vqa_attention_networks_tpu.cli.{name}"
    )
    with pytest.raises(SystemExit) as exc:
        mod.main(["--help"])
    assert exc.value.code == 0
    out = capsys.readouterr().out
    assert "--help" in out or "usage" in out.lower()
