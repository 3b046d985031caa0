"""Static markdown report — the analogue of rdv's dash viewer (O10,
SURVEY.md §2.1), reduced to what a validation pipeline can actually
archive: one self-contained markdown document per run rendering the
built profile, the per-partition verdict table, and the drift
results.  Driver-side, pure Python over already-collected artifacts
(a Profile and RunResult are both driver-bounded by construction —
per-partition component stats and verdict dicts, never rows), so
rendering costs no Spark job.  The reference checkout is empty; the
section shapes reconstruct SURVEY.md §1.1's schema/tags/drift views
as tables instead of widgets.
"""

from __future__ import annotations

from typing import Iterable


def _fmt(v) -> str:
    if v is None:
        return ""
    if isinstance(v, float):
        return f"{v:,.4f}".rstrip("0").rstrip(".")
    return str(v)


def _table(headers: list[str], rows: Iterable[Iterable]) -> list[str]:
    out = ["| " + " | ".join(headers) + " |",
           "|" + "|".join("---" for _ in headers) + "|"]
    for r in rows:
        out.append("| " + " | ".join(_fmt(c) for c in r) + " |")
    return out


def render_markdown(profile, verdicts: list[dict] | None = None,
                    drift=None, title: str | None = None) -> str:
    """Render a profile (+ optional verdicts / DriftReport) as one
    markdown document.  Sections appear only when their artifact
    does; an unbuilt component renders its name with empty stats
    rather than crashing (a partial run still gets a report)."""
    lines: list[str] = [f"# {title or profile.name} — validation report",
                        ""]

    lines += [f"Profile `{profile.name}` v{profile.version} — "
              f"{len(profile.components)} components, "
              f"{len(profile.partitions)} profiled partitions.", "",
              "## Components", ""]
    rows = []
    for name, comp in sorted(profile.components.items()):
        st = comp.stats
        kind = comp.ctype
        if st is None:
            rows.append([name, kind] + [""] * 6)
            continue
        rows.append([
            name, kind, getattr(st, "n", None),
            getattr(st, "min", None), getattr(st, "max", None),
            getattr(st, "mean", None), getattr(st, "std", None),
            getattr(st, "pinv", None)])
    lines += _table(["component", "type", "n", "min", "max", "mean",
                     "std", "pinv"], rows)

    cat = [(n, c.stats) for n, c in sorted(profile.components.items())
           if c.ctype == "categoric" and c.stats is not None
           and getattr(c.stats, "frequencies", None)]
    if cat:
        lines += ["", "## Categorical domains", ""]
        for name, st in cat:
            freqs = sorted(st.frequencies.items(),
                           key=lambda kv: (-kv[1], kv[0]))[:10]
            lines += [f"**{name}** (top {len(freqs)}): "
                      + ", ".join(f"`{k}`×{v}" for k, v in freqs), ""]

    if verdicts:
        n_fail = sum(1 for v in verdicts if not v["passed"])
        lines += ["", f"## Verdicts — {len(verdicts)} checks, "
                      f"{n_fail} failed", ""]
        rows = [[v["partition"], v["constraint"], v["n_violations"],
                 "PASS" if v["passed"] else "**FAIL**"]
                for v in sorted(verdicts,
                                key=lambda v: (v["passed"],
                                               v["partition"],
                                               v["constraint"]))]
        lines += _table(["partition", "constraint", "violations",
                         "verdict"], rows)

    if drift is not None:
        lines += ["", "## Drift vs reference — "
                      + ("**DRIFTED**" if drift.drifted else "stable"),
                  ""]
        rows = []
        for name, cd in sorted(drift.components.items()):
            for r in cd.results:
                rows.append([name, r.test, r.statistic, r.threshold,
                             "**DRIFTED**" if r.drifted else "ok"])
        lines += _table(["component", "test", "statistic", "threshold",
                         "state"], rows)

    return "\n".join(lines) + "\n"


def save_report(path: str, profile, verdicts: list[dict] | None = None,
                drift=None, title: str | None = None) -> None:
    with open(path, "w") as f:
        f.write(render_markdown(profile, verdicts, drift, title))
