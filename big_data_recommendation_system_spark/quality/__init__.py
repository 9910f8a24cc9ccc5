from .rules import EVENTS_RULES, Rule, Severity
from .compiler import compile_rule, validity_column, with_quality

__all__ = ["EVENTS_RULES", "Rule", "Severity", "compile_rule", "validity_column", "with_quality"]
