"""contrast — rdv's Schema.contrast rebuilt (SURVEY.md O6/E3).

Pairs up components of two *built* profiles by name and runs the drift
battery: numeric → KS on the stored 101-point quantile vectors (the
reference's own numeric-drift measure) + PSI; categoric → chi-squared on
the frequency maps; every component → Δpinv.  Pure driver-side
arithmetic on aggregated profiles — no cluster work.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from data_validation_spark.functions.drift import (
    DriftResult,
    chi2_drift,
    ks_drift,
    psi_drift,
)
from data_validation_spark.plans.suite import (
    CategoricStats,
    NumericStats,
    Profile,
)

DEFAULT_THRESHOLDS = {"chi2_alpha": 0.01, "ks": 0.1, "psi": 0.2,
                      "pinv_delta": 0.05}


@dataclass
class ComponentDrift:
    component: str
    results: list[DriftResult] = field(default_factory=list)

    @property
    def drifted(self) -> bool:
        return any(r.drifted for r in self.results)

    def to_jcr(self) -> dict:
        return {"component": self.component, "drifted": self.drifted,
                "results": [r.to_jcr() for r in self.results]}


@dataclass
class DriftReport:
    components: dict[str, ComponentDrift] = field(default_factory=dict)

    @property
    def drifted(self) -> bool:
        return any(c.drifted for c in self.components.values())

    def to_jcr(self) -> dict:
        return {"drifted": self.drifted,
                "components": {k: v.to_jcr() for k, v in self.components.items()}}


def contrast(current: Profile, reference: Profile,
             thresholds: dict | None = None) -> DriftReport:
    current.require_built()
    reference.require_built()
    th = {**DEFAULT_THRESHOLDS, **(thresholds or {})}
    report = DriftReport()
    for name, cur in current.components.items():
        ref = reference.components.get(name)
        if ref is None or ref.stats is None or cur.stats is None:
            continue
        cd = ComponentDrift(component=name)
        cs, rs = cur.stats, ref.stats
        if isinstance(cs, NumericStats) and isinstance(rs, NumericStats):
            if cs.quantiles and rs.quantiles:
                cd.results.append(ks_drift(cs.quantiles, rs.quantiles,
                                           threshold=th["ks"]))
                cd.results.append(psi_drift(cs.quantiles, rs.quantiles,
                                            threshold=th["psi"]))
        elif isinstance(cs, CategoricStats) and isinstance(rs, CategoricStats):
            if cs.counts and rs.frequencies:
                cd.results.append(chi2_drift(cs.counts, rs.frequencies,
                                             alpha=th["chi2_alpha"]))
        if cs.pinv is not None and rs.pinv is not None:
            delta = abs(cs.pinv - rs.pinv)
            cd.results.append(DriftResult(
                "pinv_delta", delta, None, th["pinv_delta"],
                delta > th["pinv_delta"]))
        report.components[name] = cd
    return report
