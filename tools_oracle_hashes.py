"""Regenerate ORACLE_HASHES.json: per-query oracle-SQL content hashes
with the round each hash LAST CHANGED.

This mechanizes the round-4 advisory's "changed queries front first"
rule the same way tools_plan_inventory.py mechanizes plan pins: a
query whose oracle text changes in round N gets ``round: N`` here,
and ``tests/test_rotation.py`` fails unless every such query is in
the driver window, the new-query deferral set, or the explicitly
acknowledged list — so an oracle edit can no longer slip past the
external gate by accident.

Run from the repo root AFTER any round's oracle edits:
    python3 tools_oracle_hashes.py [round]
``round`` defaults to (max CORRECTNESS round on disk) + 1 — the round
currently being built.
"""
from __future__ import annotations

import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(REPO, "ORACLE_HASHES.json")


def current_round() -> int:
    rounds = [
        int(m.group(1))
        for f in os.listdir(REPO)
        if (m := re.match(r"^CORRECTNESS_r(\d+)\.json$", f))
    ]
    return (max(rounds) if rounds else 0) + 1


def oracle_hashes() -> dict[str, str]:
    from go_mailio_diskusage_handler_spark.registry import ORACLE_SQL

    return {
        n: hashlib.sha256(sql.encode()).hexdigest()[:16]
        for n, sql in ORACLE_SQL.items()
    }


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else current_round()
    old: dict[str, dict] = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            old = json.load(fh)
    new = {}
    for name, h in oracle_hashes().items():
        prev = old.get(name)
        if prev and prev["hash"] == h:
            new[name] = prev  # unchanged: keep its last-changed round
        else:
            new[name] = {"hash": h, "round": rnd}
    dropped = sorted(set(old) - set(new))
    if dropped:
        print(f"dropped from registry: {dropped}")
    changed = sorted(n for n, v in new.items() if v["round"] == rnd)
    print(f"round {rnd}: {len(changed)} oracle(s) changed/new: {changed}")
    with open(OUT, "w") as fh:
        json.dump(new, fh, indent=1, sort_keys=True)
        fh.write("\n")


if __name__ == "__main__":
    main()
