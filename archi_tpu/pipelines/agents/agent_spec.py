"""AgentSpec: markdown-with-YAML-frontmatter agent definitions.

Mirrors the reference's ``AgentSpec``
(``src/archi/pipelines/agents/agent_spec.py:10-113``; example spec
``examples/agents/cms-comp-ops.md``): name/description/tools in frontmatter,
the prompt body below; discovery over a directory; selection by name.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional


@dataclasses.dataclass
class AgentSpec:
    name: str
    description: str = ""
    tools: list[str] = dataclasses.field(default_factory=list)
    prompt: str = ""
    model: Optional[str] = None
    source_path: Optional[str] = None

    @classmethod
    def from_markdown(cls, text: str,
                      source_path: Optional[str] = None) -> "AgentSpec":
        meta: dict = {}
        body = text
        if text.startswith("---"):
            parts = text.split("---", 2)
            if len(parts) >= 3:
                import yaml

                meta = yaml.safe_load(parts[1]) or {}
                body = parts[2]
        tools = meta.get("tools") or []
        if isinstance(tools, str):
            tools = [t.strip() for t in tools.split(",") if t.strip()]
        return cls(
            name=meta.get("name") or
            (os.path.splitext(os.path.basename(source_path))[0]
             if source_path else "agent"),
            description=meta.get("description", ""),
            tools=tools,
            prompt=body.strip(),
            model=meta.get("model"),
            source_path=source_path,
        )

    @classmethod
    def from_file(cls, path: str) -> "AgentSpec":
        with open(path, encoding="utf-8") as f:
            return cls.from_markdown(f.read(), source_path=path)

    @classmethod
    def discover(cls, directory: str) -> dict[str, "AgentSpec"]:
        specs = {}
        if not os.path.isdir(directory):
            return specs
        for f in sorted(os.listdir(directory)):
            if f.endswith(".md"):
                spec = cls.from_file(os.path.join(directory, f))
                specs[spec.name] = spec
        return specs

    def to_markdown(self) -> str:
        import yaml

        front = {"name": self.name, "description": self.description,
                 "tools": self.tools}
        if self.model:
            front["model"] = self.model
        return f"---\n{yaml.safe_dump(front)}---\n\n{self.prompt}\n"
