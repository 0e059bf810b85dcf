"""CLI surface: argument parsing for every subcommand + end-to-end runs
of a few light ones on a tiny fixture (the reference's user surface is
``hyphy <method> --kwargs``, ``unix.cpp:896-1002``)."""

import json
import os

import numpy as np
import pytest

N_TAXA, N_CODONS, SEED = 6, 18, 9


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    from hyphy_tpu.utils.synth import random_tree_newick, synthetic_codon_alignment

    aln = synthetic_codon_alignment(N_TAXA, N_CODONS, seed=SEED)
    d = tmp_path_factory.mktemp("cli")
    fa = d / "t.fasta"
    fa.write_text("".join(f">{n}\n{s}\n" for n, s in zip(aln.names, aln.sequences)))
    tr = d / "t.nwk"
    tr.write_text(random_tree_newick(N_TAXA, seed=SEED))
    return {"fasta": str(fa), "tree": str(tr), "dir": d}


def test_every_subcommand_parses():
    from hyphy_tpu.cli import build_parser

    parser = build_parser()
    subs = [a for a in parser._subparsers._group_actions[0].choices]
    # the product surface: every live analysis + utilities
    for expected in ("fel", "slac", "meme", "fubar", "busted", "busted-ph",
                     "b-still", "error-filter", "clade-support", "relax",
                     "absrel", "contrast-fel", "contrast-meme", "gard",
                     "fmm", "leisr", "fade", "bgm", "prime", "simulate",
                     "warmup"):
        assert expected in subs, expected
    args = parser.parse_args(["fel", "--alignment", "x.fas", "--tree", "t"])
    assert args.method == "fel" and args.alignment == "x.fas"


def test_cli_fel_end_to_end(tiny):
    from hyphy_tpu.cli import main

    out = str(tiny["dir"] / "out.json")
    rc = main(["fel", "--alignment", tiny["fasta"], "--tree", tiny["tree"],
               "--output", out])
    assert rc == 0 and os.path.exists(out)
    j = json.load(open(out))
    assert "MLE" in j and "timers" in j
    tab = np.asarray(j["MLE"]["content"]["0"])
    assert tab.shape[0] == N_CODONS


def test_cli_simulate_end_to_end(tiny):
    from hyphy_tpu.cli import main

    out = str(tiny["dir"] / "sim.json")
    rc = main(["simulate", "--alignment", tiny["fasta"], "--tree",
               tiny["tree"], "--replicates", "1", "--sites", "12",
               "--output", out])
    assert rc == 0
    j = json.load(open(out))
    assert len(j["files"]) == 1 and os.path.exists(j["files"][0])


def test_cli_warmup_restores_state_and_spares_results(tiny):
    from hyphy_tpu.cli import main
    from hyphy_tpu.config import settings

    rc = main(["warmup", "fel", "--alignment", tiny["fasta"], "--tree",
               tiny["tree"]])
    assert rc == 0
    assert settings.warmup is False            # restored after the run
    # the warmup wrote to a .warmup.json path, not the real result path
    assert os.path.exists(f"{tiny['fasta']}.FEL.warmup.json")
    assert not os.path.exists(f"{tiny['fasta']}.FEL.json")
