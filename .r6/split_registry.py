"""One-shot mechanical splitter for registry.py → queries/ package.

Slices registry.py at its section separators into per-family modules,
rewrites relative-import depth, prepends a shared prelude, trims
unused prelude imports by word-scan, and emits the facade registry.py.
Run from /root/repo.  Idempotent: overwrites queries/ and registry.py.
"""
import re
from pathlib import Path

SRC = Path("go_mailio_diskusage_handler_spark/registry.py")
PKG = Path("go_mailio_diskusage_handler_spark/queries")
lines = SRC.read_text().splitlines(keepends=True)

# (module, 1-based start, 1-based end inclusive, docstring title)
SLICES = [
    ("q_du",          36,  104, "Reference disk-usage pipeline (SURVEY §2 O5-O12): du_core and friends"),
    ("q_relational",  105,  279, "Relational breadth (SURVEY §2.1): joins, windows, sorts/top-k, set ops"),
    ("q_scalar",      280,  446, "Scalar function families: date, math, JSON, array + event windows"),
    ("q_text",        447,  631, "LLM-pipeline: text analysis + fingerprinting + exact dedup"),
    ("q_dedup",       632,  748, "LLM-pipeline: MinHash LSH / SimHash / n-gram Jaccard near-dup"),
    ("q_curation",    749, 1005, "Training-data curation: splits / mixture / decontamination"),
    ("q_similarity", 1006, 1167, "Similarity search over embeddings (brute-force + LSH ANN)"),
    ("q_sessions",   1168, 1304, "Multimodal plumbing + sessionization + sliding windows"),
    ("q_relational2",1305, 1404, "Relational breadth round 2: pivot, exact percentiles, cube"),
    ("q_udf",        1405, 1483, "Python UDF surface: scalar pandas_udf, grouped-agg pandas_udf"),
    ("q_quality_ann",1484, 2141, "Data-quality gate (O9), skew-salted aggregation, IVF/PQ ANN stack"),
    ("q_sqltier",    2142, 2274, "SQL surface: textual spark.sql over registered views (sql.py)"),
    ("q_round5",     2275, 2754, "Round-5 additions: heavy hitters, outer joins, eval harnesses"),
    ("rotation_r45", 2755, 2910, "Registration-order rotation: policy, _rotate_front, round-4/5 fronts"),
    ("q_round5_cont",2911, 3948, "Round-5 continuation additions, batch 1"),
    ("q_round5_cont2",3949,5068, "Round-5 continuation additions, batch 2"),
    ("rotation_r6",  5069, 5177, "Round-6 rotation window: backlog-drain front (pure rotation)"),
]
assert lines[5176].startswith("_rotate_front(_R6_FRONT)")

PRELUDE = """from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import scalars
from ..operators import core, relational
from ..sources.tables import load_table
from ._base import ORACLE_SQL, QUERIES, register
"""

def rewrite_relative(text: str) -> str:
    text = re.sub(r"(?m)^(\s*)from \. import ", r"\1from .. import ", text)
    text = re.sub(r"(?m)^(\s*)from \.(?=[a-z])", r"\1from ..", text)
    return text

def trim_prelude(prelude: str, body: str) -> str:
    kept = []
    for ln in prelude.splitlines():
        m = re.findall(r"import (.+)$", ln)
        if not m or ln.startswith("from __future__"):
            kept.append(ln)
            continue
        names = [n.split(" as ")[-1].strip() for n in m[0].split(",")]
        if any(re.search(rf"\b{re.escape(n)}\b", body) for n in names):
            # keep only the used names on this line
            used = [n.strip() for n in m[0].split(",")
                    if re.search(rf"\b{re.escape(n.split(' as ')[-1].strip())}\b", body)]
            kept.append(ln[: ln.index("import ")] + "import " + ", ".join(used))
    return "\n".join(kept) + "\n"

PKG.mkdir(exist_ok=True)

# _base.py: header lines 1-33 (docstring + register + dicts), imports trimmed.
base_body = "".join(lines[0:33])
base_body = base_body.replace(
    '"""Query registry: every implemented operator as a named (spark,\n'
    'sf_dir) -> DataFrame callable plus its DuckDB oracle SQL.',
    '"""Shared registry state: the QUERIES / ORACLE_SQL dicts and the\n'
    '``register`` decorator every ``q_*`` family module populates.',
)
base_body = rewrite_relative(base_body)
# drop the operator imports _base itself doesn't use
base_body = "\n".join(
    ln for ln in base_body.splitlines()
    if not re.match(r"from \.\.(functions|operators|sources)", ln)
) + "\n"
(PKG / "_base.py").write_text(base_body)

mod_names = []
for mod, start, end, title in SLICES:
    body = "".join(lines[start - 1 : end])
    body = rewrite_relative(body)
    doc = f'"""{title}.\n\nSplit from the monolithic registry.py in round 6; registration\norder is preserved by the import sequence in ``..registry``.\n"""\n'
    prel = trim_prelude(PRELUDE, body)
    (PKG / f"{mod}.py").write_text(doc + prel + "\n\n" + body.lstrip("\n"))
    mod_names.append(mod)

(PKG / "__init__.py").write_text(
    '"""Per-family query modules (split from the round-5 monolithic\n'
    'registry.py).  Import order — and therefore registration order —\n'
    'is owned by ``..registry``; do not import these modules directly.\n"""\n'
)

FACADE = '''"""Query registry: every implemented operator as a named (spark,
sf_dir) -> DataFrame callable plus its DuckDB oracle SQL.

This is the single source of truth consumed by ``__spark_entry__.py``,
``bench.py``, and the tests.  Convention: each Spark query aliases
every computed column, and the oracle SQL uses the *same* aliases so
the driver's order-insensitive value hash lines up.

The query bodies live in per-family modules under ``queries/`` (split
from the former 5k-line monolith in round 6).  IMPORT ORDER HERE IS
LOAD-BEARING: it is the registration order, and the driver's
correctness gate checks the first 50 registry entries each round.
The sequence reproduces the monolith exactly — family modules in their
original order, the round-4/5 rotations applied between the round-5
additions and the continuation batches, then the round-6 rotation
last (rotation policy and window history: ``queries/rotation_r45.py``
and ``queries/rotation_r6.py``).
"""

from __future__ import annotations

from .queries._base import ORACLE_SQL, QUERIES, register  # noqa: F401

# Family modules, in registration order (each import populates
# QUERIES/ORACLE_SQL via the register decorator at import time).
from .queries import q_du  # noqa: E402,F401
from .queries import q_relational  # noqa: E402,F401
from .queries import q_scalar  # noqa: E402,F401
from .queries import q_text  # noqa: E402,F401
from .queries import q_dedup  # noqa: E402,F401
from .queries import q_curation  # noqa: E402,F401
from .queries import q_similarity  # noqa: E402,F401
from .queries import q_sessions  # noqa: E402,F401
from .queries import q_relational2  # noqa: E402,F401
from .queries import q_udf  # noqa: E402,F401
from .queries import q_quality_ann  # noqa: E402,F401
from .queries import q_sqltier  # noqa: E402,F401
from .queries import q_round5  # noqa: E402,F401

# Round-4/5 window rotations (applied on import, BEFORE the
# continuation batches register — the tail order depends on it).
from .queries import rotation_r45  # noqa: E402,F401

from .queries import q_round5_cont  # noqa: E402,F401
from .queries import q_round5_cont2  # noqa: E402,F401

# Round-6 window rotation (applied on import, last).
from .queries import rotation_r6  # noqa: E402,F401
'''
SRC.write_text(FACADE)

print("wrote", len(mod_names) + 2, "files + facade")
