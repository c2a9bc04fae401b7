"""Iteratively import the split registry; on each NameError, add a
cross-module import of the missing name from its defining module."""
import re
import subprocess
import sys
from pathlib import Path

PKG = Path("go_mailio_diskusage_handler_spark/queries")
MODS = [p.stem for p in PKG.glob("*.py") if p.stem != "__init__"]

for _ in range(80):
    r = subprocess.run(
        [sys.executable, "-c", "from go_mailio_diskusage_handler_spark import registry; print('IMPORT-OK', len(registry.QUERIES), len(registry.ORACLE_SQL))"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    if "IMPORT-OK" in r.stdout:
        print(r.stdout.strip())
        break
    err = r.stderr
    m = re.search(r'File "([^"]+/queries/(\w+)\.py)", line \d+', err.strip().split("NameError")[0].rsplit("File", 1)[0] + 'File "' + err.strip().rsplit('File "', 1)[1])
    # simpler: last File line before the NameError
    files = re.findall(r'File "[^"]+/queries/(\w+)\.py"', err)
    name_m = re.search(r"NameError: name '(\w+)' is not defined", err)
    if not files or not name_m:
        print("UNHANDLED ERROR:\n", err[-3000:])
        sys.exit(1)
    failing_mod, missing = files[-1], name_m.group(1)
    KNOWN = {
        "core": "from ..operators import core",
        "relational": "from ..operators import relational",
        "curation": "from ..operators import curation",
        "dedup": "from ..operators import dedup",
        "text": "from ..operators import text",
        "similarity": "from ..operators import similarity",
        "multimodal": "from ..operators import multimodal",
        "sessions": "from ..operators import sessions",
        "udfs": "from ..functions import udfs",
        "scalars": "from ..functions import scalars",
        "sql_surface": "from .. import sql as sql_surface",
        "bucketing": "from ..sources import bucketing",
        "streaming_windows": "from ..streaming import windows as streaming_windows",
        "load_table": "from ..sources.tables import load_table",
    }
    if missing in KNOWN:
        f = PKG / f"{failing_mod}.py"
        text_ = f.read_text()
        imp = KNOWN[missing] + "  # noqa: E402\n"
        if imp in text_:
            print(f"LOOP: {imp} already present in {failing_mod}")
            sys.exit(1)
        anchor = re.search(r"(?m)^from \._base import .*\n", text_)
        pos = anchor.end() if anchor else re.search(r"(?m)^from ", text_).start()
        f.write_text(text_[:pos] + imp + text_[pos:])
        print(f"{failing_mod}: + {imp.strip()}")
        continue
    # find defining module: top-level "NAME = " or "def NAME(" or "NAME: "
    defin = None
    pat = re.compile(rf"(?m)^(?:{re.escape(missing)}\s*(?:=|:)|def {re.escape(missing)}\()")
    for mod in MODS:
        if mod == failing_mod:
            continue
        if pat.search((PKG / f"{mod}.py").read_text()):
            defin = mod
            break
    if defin is None:
        print(f"NO DEFINER for {missing} (needed by {failing_mod})\n", err[-2000:])
        sys.exit(1)
    f = PKG / f"{failing_mod}.py"
    text = f.read_text()
    imp = f"from .{defin} import {missing}\n"
    if imp in text:
        print(f"LOOP: {imp} already present in {failing_mod}")
        sys.exit(1)
    # insert after the _base import line
    anchor = re.search(r"(?m)^from \._base import .*\n", text)
    pos = anchor.end() if anchor else re.search(r"(?m)^from ", text).start()
    f.write_text(text[:pos] + imp + text[pos:])
    print(f"{failing_mod}: + {imp.strip()}")
else:
    print("exceeded iteration cap")
    sys.exit(1)
