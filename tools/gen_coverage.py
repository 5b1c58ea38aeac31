"""Generate COVERAGE.md from the query registry — one row per operator:
name, tags, oracle status, one-line description.  Run after adding queries:

    python tools/gen_coverage.py
"""

from __future__ import annotations

import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from map_reduce485_spark.queries import REGISTRY, _load_all


def main() -> int:
    _load_all()
    by_tag: dict[str, list] = defaultdict(list)
    for spec in REGISTRY.values():
        key = spec.tags[0] if spec.tags else "other"
        by_tag[key].append(spec)

    n_oracle = sum(1 for s in REGISTRY.values() if s.oracle is not None)
    lines = [
        "# Operator coverage (auto-generated — `python tools/gen_coverage.py`)",
        "",
        f"{len(REGISTRY)} registry queries; {n_oracle} DuckDB-oracle-checked, "
        f"{len(REGISTRY) - n_oracle} rows-only by design.  Every row is callable as "
        "`__spark_entry__.queries()[name](spark, sf_dir)`.",
        "",
    ]
    for tag in sorted(by_tag):
        lines.append(f"## {tag}")
        lines.append("")
        lines.append("| query | oracle | bench | summary |")
        lines.append("|---|---|---|---|")
        for spec in sorted(by_tag[tag], key=lambda s: s.name):
            doc = (spec.doc or "").strip().split("\n")[0].rstrip(".")
            oracle = "sql" if spec.oracle is not None else "rows-only"
            bench = "yes" if spec.bench else ""
            lines.append(f"| `{spec.name}` | {oracle} | {bench} | {doc} |")
        lines.append("")
    Path("COVERAGE.md").write_text("\n".join(lines))
    print(f"COVERAGE.md: {len(REGISTRY)} queries in {len(by_tag)} groups")
    return 0


if __name__ == "__main__":
    sys.exit(main())
