"""Help mode (main_mode_help, src/mode_help.cpp:35-110)."""
from __future__ import annotations

import sys

from ..utils import ArgsParser

_TOPICS = {
    "build": """metacache build <database> <sequence files/dirs...> OPTIONS
  -taxonomy <dir>      directory with NCBI nodes.dmp/names.dmp/merged.dmp
  -taxpostmap <files>  accession->taxid mapping files applied post-build
  -kmerlen <n>         k-mer length (default 16, max 16)
  -sketchlen <n>       features per window (default 16)
  -winlen <n>          window length (default 128)
  -winstride <n>       window stride (default winlen-kmerlen+1)
  -max-locations-per-feature <n>   cap per feature (default 254)
  -remove-overpopulated-features   drop features at the location cap
  -remove-ambig-features <rank>    drop features spanning many taxa
  -max-ambig-per-feature <n>
  -num-shards <n>      build n database shards (round-robin by target)""",
    "query": """metacache query <database> <read files/dirs...> OPTIONS
  -out <file>          write output to file
  -pairfiles           paired reads in consecutive files
  -pairseq             paired reads within one file
  -insertsize <n>      max insert size
  -lowest <rank>       lowest classification rank (default sequence)
  -highest <rank>      highest classification rank (default domain)
  -hitmin <n>          min hits (default deduced from sketch size)
  -hitdiff <p>         candidate inclusion threshold fraction/percent
  -maxcand <n>         max candidates per query (default 2)
  -tophits/-allhits/-locations/-lineage/-queryids
  -taxids/-taxids-only/-omit-ranks/-separator <s>
  -mapped-only/-no-map
  -abundances [<file>] -abundance-per <rank>
  -precision -ground-truth -taxon-coverage
  -query-limit <n>     max reads per file""",
    "info": "metacache info <database> "
            "[targets|lineages|rank <r>|statistics|featuremap|featurecounts]",
    "modify": "metacache modify <database> <sequence files...> "
              "(same options as build)",
    "annotate": "metacache annotate <infile> taxid -mapping-files <files...>",
    "merge": "metacache merge <result files...> -taxonomy <dir> "
             "-lowest <rank> [-out <file>]",
}


def main_mode_help(args: ArgsParser) -> int:
    topic = args.positionals[1] if len(args.positionals) > 1 else ""
    if topic in _TOPICS:
        print(_TOPICS[topic])
        return 0
    print("metacache-tpu — TPU-native metagenomic classification\n"
          "modes: " + ", ".join(sorted(_TOPICS)) +
          "\nuse 'metacache help <mode>' for details")
    return 0
