"""Regenerate fixtures/expansion_dict.jsonl — a small EXTERNAL
(term, expansion, weight, kind) dictionary in the WordNet/GloVe slot of
the reference's query expansion (Search_FR.java:281-623 loads extJWNL /
GloVe models and weights synonyms 1.0/2.0 and antonyms -1.5).

The entries are ordinary-English synonym/antonym pairs over the
testdata vocabulary (public knowledge, deterministic, committed) so the
end-to-end gate `external_expansion_topk` exercises a SHIPPED external
table rather than a corpus-derived one.  Expansions that are absent
from the corpus vocabulary ("flame") are deliberate: they must be
harmless (no matching postings).
"""

import json
import os

ROWS = [
    # synonyms at the reference's two synonym weights (1.0 body, 2.0 title)
    {"term": "join", "expansion": "merge", "weight": 1.0, "kind": "synonym"},
    {"term": "merge", "expansion": "join", "weight": 1.0, "kind": "synonym"},
    {"term": "sort", "expansion": "order", "weight": 1.0, "kind": "synonym"},
    {"term": "query", "expansion": "scan", "weight": 2.0, "kind": "synonym"},
    {"term": "spark", "expansion": "flame", "weight": 1.0, "kind": "synonym"},
    # antonyms at the reference's -1.5
    {"term": "fast", "expansion": "slow", "weight": -1.5, "kind": "antonym"},
    {"term": "big", "expansion": "small", "weight": -1.5, "kind": "antonym"},
    {"term": "slow", "expansion": "fast", "weight": -1.5, "kind": "antonym"},
]


def main() -> None:
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "fixtures", "expansion_dict.jsonl")
    with open(out, "w") as f:
        for r in ROWS:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {len(ROWS)} rows -> {out}")


if __name__ == "__main__":
    main()
