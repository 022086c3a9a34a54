"""Style rule engine: the engine's port surface for mkgmap's style language.

The reference's main user-extension point is the style: text rules
``predicate {actions} [0xTYPE resolution R]`` evaluated per element,
first-match-wins unless ``continue`` (``osmstyle/RuleSet.java:79-110``,
``osmstyle/RuleFileReader.java``, grammar in ``doc/styles/rules.txt``).

Here a style compiles once (driver or actor ``__init__``) into a rule
program; evaluation is VECTORIZED over Arrow/pandas batches of tag
columns — each rule's predicate is one boolean-mask pass, actions are
masked column assignments, and the first-match/continue semantics are a
``done`` mask carried across rules. O(rules × rows) vector work, no
per-row Python.
"""

from .expr import parse_expr
from .rules import Rule, RuleSet, compile_style

__all__ = ["Rule", "RuleSet", "compile_style", "parse_expr"]
