"""Agent: a string-DSL toolchain executor.

Behavioral parity with the reference Agent (/root/reference/
phi_3_vision_mlx.py:119-232): a toolchain is a multi-line string of
``out1, out2 = tool(arg1, arg2)`` steps executed over a shared ``ongoing``
dict, with kwargs auto-filtered by each tool's signature, per-step JSON
logging, and quote-to-``<|api_input|>`` rewriting when the API tools are
enabled.

Architecture difference: tool names resolve through an explicit registry
(plus any callables passed in ``tools=``) instead of ``eval`` — same DSL,
no arbitrary-code evaluation at parse time.
"""

from __future__ import annotations

import inspect
import json
from typing import Callable, Dict, Optional


def _default_registry() -> Dict[str, Callable]:
    from .. import api
    from . import tools

    return {
        "add_code": tools.add_code,
        "add_text": tools.add_text,
        "rag": tools.rag,
        "get_api": tools.get_api,
        "generate": api.generate,
        "choose": api.choose,
        "constrain": api.constrain,
        "execute": api.execute,
    }


class Agent:
    """Toolchain executor (see module docstring).

    Example:
        >>> agent = Agent()
        >>> result = agent("Plot a sine wave.")
        >>> result["responses"], result["files"]
    """

    _default_toolchain = """
        prompt = add_code(prompt, codes)
        responses = generate(prompt, images)
        files, codes = execute(responses, step)
        """

    def __init__(self, toolchain: Optional[str] = None, enable_api: bool = True,
                 tools: Optional[Dict[str, Callable]] = None, **kwargs):
        from ..api import load

        self.registry = _default_registry()
        if tools:
            self.registry.update(tools)
        kwargs = kwargs | {"enable_api": enable_api}
        self.enable_api = enable_api
        self.kwargs = (
            kwargs if "preload" in kwargs else kwargs | {"preload": load(**{
                k: v for k, v in kwargs.items()
                if k in ("blind_model", "quantize_model", "quantize_cache", "use_adapter")
            })}
        )
        self.set_toolchain(toolchain)
        self.reset()

    def __call__(self, prompt: str, images=None):
        prompt = prompt.replace('"', "<|api_input|>") if self.enable_api else prompt
        self.ongoing.update({"prompt": prompt})
        if images is not None:
            self.ongoing.update({"images": images})
        for tool in self.toolchain:
            fxn = tool["fxn"]
            args = [self.ongoing.get(i, None) for i in tool["args"]]
            kwargs = {
                k: v
                for k, v in self.kwargs.items()
                if k in inspect.signature(fxn).parameters.keys()
            }
            returned = fxn(*args, **kwargs)
            if isinstance(returned, dict):
                self.ongoing.update({k: returned[k] for k in tool["out"]})
            else:
                self.ongoing.update({k: returned for k in tool["out"]})
        self.log_step()
        return {i: self.ongoing.get(i, None) for i in self.list_outs}

    def reset(self):
        self.log = []
        self.ongoing = {"step": 0}

    def log_step(self):
        self.log.append({k: _jsonable(v) for k, v in self.ongoing.items()})
        with open("agent_log.json", "w") as f:
            json.dump(self.log, f, indent=4)
        self.ongoing = {k: None if v == [None] else v for k, v in self.ongoing.items()}
        self.ongoing["step"] += 1

    def end(self):
        self.ongoing.update({"END": "END"})
        self.log_step()
        self.reset()

    def set_toolchain(self, s: Optional[str]):
        def _parse_step(line: str):
            line = line.strip().rstrip(")")
            out_part, fxn_part = line.split("=")
            fxn_name, args_part = fxn_part.split("(")
            name = fxn_name.strip()
            if name not in self.registry:
                raise KeyError(
                    f"unknown tool {name!r}; register it via Agent(tools={{...}})"
                )
            return {
                "fxn": self.registry[name],
                "args": [a.strip() for a in args_part.split(",")],
                "out": [o.strip() for o in out_part.split(",")],
            }

        def _parse_return(s: str):
            if "return " not in s:
                return ["responses", "files"]
            return [i.strip() for i in s.split("return ")[1].split(",")]

        s = self._default_toolchain if s is None else s
        self.toolchain = [_parse_step(i) for i in s.split("\n") if "=" in i]
        self.list_outs = _parse_return(s)


def _jsonable(v):
    try:
        json.dumps(v)
        return v
    except (TypeError, ValueError):
        return repr(v)
