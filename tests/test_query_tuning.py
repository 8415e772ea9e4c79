"""Query-time database tuning (mode_query.cpp:354-388 semantics) and
REPL/splitout engine reuse."""
import dataclasses
import io
import os

import numpy as np
import pytest

from metacache_tpu.config import BuildParams, SketchParams
from metacache_tpu.db.build import build_database_from_records
from metacache_tpu.db.database import Database
from metacache_tpu.db.taxonomy import Rank, Taxonomy
from metacache_tpu.modes.query import (QueryModeOptions,
                                       _apply_database_tuning,
                                       get_query_options,
                                       run_interactive_query_mode)
from metacache_tpu.utils import ArgsParser
from tests import util_mockdata as mock


@pytest.fixture()
def db():
    rng = np.random.default_rng(3)
    genome = mock.random_genome(rng, 3000)
    tax = Taxonomy()
    tax.add_node(1, 1, "root", Rank.ROOT)
    tax.add_node(2, 1, "Bacteria", Rank.DOMAIN)
    records = []
    for i in range(6):   # identical genomes -> every feature in 6 buckets
        tax.add_node(100 + i, 2, f"Species{i}", Rank.SPECIES)
        records.append((f"NC_{i:06d}.1|taxid|{100 + i}| copy", genome))
    return build_database_from_records(records, taxonomy=tax)


def _opts(argv):
    return get_query_options(ArgsParser(["query", "db"] + argv))


def test_max_locations_per_feature_truncates(db):
    assert int(db.features.bucket_sizes().max()) == 6
    opt = _opts(["-max-locations-per-feature", "2"])
    _apply_database_tuning(opt, db)
    assert int(db.features.bucket_sizes().max()) == 2
    assert db.max_locations_per_feature == 2
    # kept entries are the FIRST of each run = lowest target ids
    assert set(np.unique(db.features.loc_tgt)) <= {0, 1}


def test_remove_overpopulated_features(db):
    n_keys = db.features.num_keys
    opt = _opts(["-remove-overpopulated-features",
                 "-max-locations-per-feature", "3"])
    _apply_database_tuning(opt, db)
    # maxlpf = 3 - 1 = 2: every feature has 6 >= 3 locations -> all removed
    assert db.features.num_keys < n_keys
    assert int(db.features.bucket_sizes().max(initial=0)) <= 2
    assert db.max_locations_per_feature == 3


def test_remove_overpopulated_default_cap(db):
    opt = _opts(["-remove-overpopulated-features"])
    _apply_database_tuning(opt, db)
    # no explicit max: maxlpf = 253; nothing has >253 locations
    assert db.max_locations_per_feature == \
        Database.MAX_SUPPORTED_LOCS_PER_FEATURE


def test_query_sketcher_override(db):
    opt = _opts(["-sketchlen", "8", "-winlen", "64"])
    _apply_database_tuning(opt, db)
    assert db.query_sketch_params.sketch_size == 8
    assert db.query_sketch_params.window_size == 64
    # winstride defaults to winlen when only winlen is given
    # (query_options.cpp:58-60)
    assert db.query_sketch_params.window_stride == 64
    # target sketcher untouched
    assert db.sketch_params.sketch_size == 16


def test_ignored_compat_flags_parse():
    opt = _opts(["-max-load-fac", "0.8",
                 "-per-thread-sequential-queries", "4"])
    assert isinstance(opt, QueryModeOptions)  # accepted, no effect


def test_repl_reuses_engine(tmp_path, db, monkeypatch, capsys):
    base = str(tmp_path / "repl_db")
    db.save(base)
    reads = tmp_path / "r.fa"
    genome = mock.random_genome(np.random.default_rng(3), 3000)
    mock.write_fasta(str(reads), [("q1", genome[500:620])])
    out1 = str(tmp_path / "o1.txt")
    out2 = str(tmp_path / "o2.txt")
    out3 = str(tmp_path / "o3.txt")
    lines = iter([f"{reads} -out {out1}", f"{reads} -out {out2}",
                  f"{reads} -hitmin 99 -out {out3}", ":q"])
    monkeypatch.setattr("builtins.input", lambda *_: next(lines))
    rc = run_interactive_query_mode(base, ArgsParser(["query", base]))
    assert rc == 0
    assert os.path.exists(out1) and os.path.exists(out2)
    err = capsys.readouterr().err
    # the identical line AND the -hitmin line must both reuse the engine:
    # hits_min is a runtime device scalar, not program shape
    assert err.count("(reusing loaded engine)") == 2
    # ... and the new threshold must actually apply (hitmin 99 on a
    # 16-feature sketch classifies nothing)
    with open(out1) as f:
        mapped1 = [l for l in f if not l.startswith("#")]
    with open(out3) as f:
        mapped3 = [l for l in f if not l.startswith("#")]
    l1 = [l for l in mapped1 if l.startswith("q1")]
    l3 = [l for l in mapped3 if l.startswith("q1")]
    assert l1 and "--" not in l1[0]
    assert l3 and "--" in l3[0]
