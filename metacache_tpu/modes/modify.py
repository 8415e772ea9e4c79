"""Modify mode: add targets to an existing database
(main_mode_build_modify, src/mode_build.cpp:1117-1136)."""
from __future__ import annotations

import sys

import numpy as np

from ..db import build as build_mod
from ..db.database import Database
from ..db.feature_table import FeatureTable
from ..db.taxonomy import NONE_TAXID, Rank
from ..io import sequence_io, taxonomy_io
from ..ops import encode
from ..utils import ArgsParser
from .build import get_build_options


def main_mode_modify(args: ArgsParser) -> int:
    if len(args.positionals) < 3:
        print("usage: metacache modify <database> <sequence files/dirs...> "
              "OPTIONS", file=sys.stderr)
        return 1
    dbfile = args.positionals[1]
    infiles = args.positionals[2:]

    db = Database.load(dbfile, 0)
    opt = get_build_options(args)
    p = db.sketch_params

    files = build_mod.gather_input_files(infiles)
    seq2taxid = taxonomy_io.make_sequence_to_taxon_id_map(
        opt.sequence_id_mappings, files)

    triples = build_mod.ChunkedTripleSorter()
    batcher = build_mod.WindowBatcher(p, triples)
    existing = {db.taxonomy.names[n] for n in db.target_taxon_node}
    target_nodes = list(db.target_taxon_node)
    added = 0
    for path in files:
        try:
            for rec in sequence_io.read_sequences(path):
                sid = sequence_io.extract_accession_string(rec.header) \
                    or rec.header.split(" ")[0] or rec.header
                if not rec.data or sid in existing:
                    continue
                existing.add(sid)
                tgt = len(target_nodes)
                codes = encode.np_encode_bytes(
                    np.frombuffer(rec.data.encode(), dtype=np.uint8))
                windows = batcher.add_sequence(codes, tgt)
                parent = build_mod.resolve_parent_taxid(rec.header, seq2taxid,
                                                        db.taxonomy)
                node = db.taxonomy.add_node(
                    -(tgt + 1), parent if parent else NONE_TAXID, sid,
                    Rank.SEQUENCE, source_filename=path,
                    source_index=rec.index, source_windows=windows)
                target_nodes.append(node)
                added += 1
        except sequence_io.FormatError as e:
            print(f"FAIL: {path}: {e}", file=sys.stderr)
    batcher.finish()

    new_ft = triples.finalize(db.max_locations_per_feature)
    db.features = db.features.merge_with(new_ft,
                                         db.max_locations_per_feature)
    db.target_taxon_node = np.array(target_nodes, dtype=np.int32)
    path = db.save(dbfile)
    print(f"Added {added} reference sequences.")
    print(f"Writing database to file '{path}' ... done.")
    return 0
