"""Shard/merge workflow: N-shard runs produce identical calls to 1 run."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
from synth import standard_fixture  # noqa: E402

from longtr_tpu.cli import main as cli_main  # noqa: E402
from longtr_tpu.io.bgzf import bgzf_open_text  # noqa: E402
from longtr_tpu.parallel.multihost import (merge_sorted_vcfs,  # noqa: E402
                                           shard_regions)


def vcf_body(path):
    with bgzf_open_text(path) as fh:
        return [ln for ln in fh if not ln.startswith("##")]


def test_shard_regions_partition():
    regions = list(range(10))
    shards = [shard_regions(regions, 3, i) for i in range(3)]
    assert sorted(x for s in shards for x in s) == regions
    assert shards[0] == [0, 3, 6, 9]


def test_sharded_runs_merge_to_single_run(tmp_path):
    fx = standard_fixture(str(tmp_path))
    base = ["--bams", ",".join(fx["bams"]), "--fasta", fx["fasta"],
            "--regions", fx["bed"], "--min-reads", "5", "--quiet"]
    whole = str(tmp_path / "whole.vcf.gz")
    assert cli_main(base + ["--tr-vcf", whole]) == 0
    shard_paths = []
    for i in range(2):
        p = str(tmp_path / f"shard{i}.vcf.gz")
        assert cli_main(base + ["--tr-vcf", p, "--shard", f"{i}/2"]) == 0
        shard_paths.append(p)
    merged = str(tmp_path / "merged.vcf.gz")
    merge_sorted_vcfs(shard_paths, merged)
    assert vcf_body(merged) == vcf_body(whole)
