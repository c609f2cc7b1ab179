"""Job profiles: the full enrichment-job spec as serializable JSON.

Analogue of the reference Profile (utils/config.py:169-216) + Session
(utils/session.py:17-98): one document that fully describes an
enrichment run — sources, key columns + options, ordered mappings,
batch filter — restorable across processes. The linkage pipeline has its
own ``PipelineConfig``; this covers the merge/enrichment side.
"""

from __future__ import annotations

import datetime as dt
import json
from dataclasses import asdict, dataclass, field
from pathlib import Path
from typing import Optional, Sequence

from datamatcher_spark.operators.merge import (
    ColumnMapping,
    RuleCondition,
    RuleOperator,
    WriteMode,
)


@dataclass
class SourceSpec:
    name: str
    path: str                       # parquet path or catalog table
    key_column: str
    key_options: dict = field(default_factory=dict)


@dataclass
class BatchFilterSpec:
    kind: str = "none"              # none|range|key_list|limit|regex
    start: int = 0
    end: int = 0
    keys: Sequence[str] = ()
    limit: int = 0
    pattern: str = ""


@dataclass
class Profile:
    name: str
    base: SourceSpec
    sources: list[SourceSpec]
    mappings: list[ColumnMapping]
    batch_filter: BatchFilterSpec = field(default_factory=BatchFilterSpec)
    updated_at: str = ""

    def to_json(self, path: str | Path) -> None:
        doc = {
            "name": self.name,
            "base": asdict(self.base),
            "sources": [asdict(s) for s in self.sources],
            "mappings": [_mapping_to_dict(m) for m in self.mappings],
            "batch_filter": {**asdict(self.batch_filter),
                             "keys": list(self.batch_filter.keys)},
            "updated_at": dt.datetime.now(dt.timezone.utc).isoformat(),
        }
        Path(path).write_text(json.dumps(doc, indent=2))

    @classmethod
    def from_json(cls, path: str | Path) -> "Profile":
        doc = json.loads(Path(path).read_text())
        return cls(
            name=doc["name"],
            base=SourceSpec(**doc["base"]),
            sources=[SourceSpec(**s) for s in doc["sources"]],
            mappings=[_mapping_from_dict(m) for m in doc["mappings"]],
            batch_filter=BatchFilterSpec(**doc.get("batch_filter", {})),
            updated_at=doc.get("updated_at", ""),
        )


def _mapping_to_dict(m: ColumnMapping) -> dict:
    return {
        "source_column": m.source_column,
        "target_column": m.target_column,
        "write_mode": m.write_mode.value,
        "transform": m.transform,
        "append_separator": m.append_separator,
        "priority": m.priority,
        "enabled": m.enabled,
        "output_name": m.output_name,
        "source_template": m.source_template,
        "condition_logic": m.condition_logic,
        "conditions": [
            {
                "column": c.column,
                "operator": c.operator.value,
                "value": c.value,
                "is_source_column": c.is_source_column,
            }
            for c in m.conditions
        ],
    }


def _mapping_from_dict(d: dict) -> ColumnMapping:
    return ColumnMapping(
        source_column=d.get("source_column", ""),
        target_column=d.get("target_column", ""),
        write_mode=WriteMode(d.get("write_mode", "overwrite")),
        transform=d.get("transform"),
        append_separator=d.get("append_separator", " | "),
        priority=d.get("priority", 0),
        enabled=d.get("enabled", True),
        output_name=d.get("output_name", ""),
        source_template=d.get("source_template", ""),
        condition_logic=d.get("condition_logic", "AND"),
        conditions=[
            RuleCondition(
                column=c["column"],
                operator=RuleOperator(c["operator"]),
                value=c.get("value", ""),
                is_source_column=c.get("is_source_column", True),
            )
            for c in d.get("conditions", [])
        ],
    )
