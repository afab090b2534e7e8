"""INFO-key boolean expressions for --extract-if-info / --exclude-if-info.

Behavior reference: ValidateAndAllocCmpExpr + the LoadPvar INFO filter
(2.0/plink2_cmdline.cc CmpExpr parsing, 2.0/plink2_pvar.cc:742-900):
  * operators ==/=, !=, <, <=, >, >= over INFO keys, combined with
    && and || and parentheses; chained comparisons (999<DP<99999) expand
    to conjunctions;
  * a value of ';' denotes the empty string;
  * unless the operator is !=, a predicate evaluates to FALSE when the
    key is missing (and != evaluates to TRUE);
  * ordering comparisons are numeric (false on unparseable values);
    equality tries numeric when both sides parse, else exact string.
"""

from __future__ import annotations

import re

_TOKEN = re.compile(
    r"\s*(&&|\|\||<=|>=|==|!=|=|<|>|\(|\)|[^\s()&|<>=!]+)"
)
_OPS = {"==", "=", "!=", "<", "<=", ">", ">="}


def _is_num(tok: str) -> bool:
    try:
        float(tok)
        return True
    except ValueError:
        return False


class _Cmp:
    __slots__ = ("key", "op", "val")

    def __init__(self, key: str, op: str, val: str):
        self.key = key
        self.op = "==" if op == "=" else op
        self.val = "" if val == ";" else val

    def eval(self, info: dict[str, str | None]) -> bool:
        if self.key not in info:
            return self.op == "!="
        raw = info[self.key]
        raw = "" if raw is None else raw
        if self.op in ("==", "!="):
            if _is_num(raw) and _is_num(self.val):
                eq = float(raw) == float(self.val)
            else:
                eq = raw == self.val
            return eq if self.op == "==" else not eq
        if not _is_num(raw) or not _is_num(self.val):
            return False
        a, b = float(raw), float(self.val)
        return {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b}[self.op]


_FLIP = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "==": "==",
         "=": "=", "!=": "!="}


class InfoExpr:
    """Parsed boolean expression over INFO keys."""

    def __init__(self, text: str):
        self._toks = _TOKEN.findall(text)
        self._pos = 0
        self._ast = self._parse_or()
        if self._pos != len(self._toks):
            raise ValueError(f"--extract-if-info: trailing junk in {text!r}")

    # grammar: or := and ('||' and)* ; and := atom ('&&' atom)* ;
    # atom := '(' or ')' | comparison-chain
    def _peek(self):
        return self._toks[self._pos] if self._pos < len(self._toks) else None

    def _next(self):
        t = self._peek()
        self._pos += 1
        return t

    def _parse_or(self):
        node = self._parse_and()
        while self._peek() == "||":
            self._next()
            node = ("or", node, self._parse_and())
        return node

    def _parse_and(self):
        node = self._parse_atom()
        while self._peek() == "&&":
            self._next()
            node = ("and", node, self._parse_atom())
        return node

    def _parse_atom(self):
        if self._peek() == "(":
            self._next()
            node = self._parse_or()
            if self._next() != ")":
                raise ValueError("--extract-if-info: unbalanced parentheses")
            return node
        # comparison chain: operand (op operand)+
        operands = [self._next()]
        ops = []
        while self._peek() in _OPS:
            ops.append(self._next())
            operands.append(self._next())
        if not ops or any(o is None for o in operands):
            raise ValueError("--extract-if-info: expected a comparison")
        cmps = []
        for i, op in enumerate(ops):
            lhs, rhs = operands[i], operands[i + 1]
            if _is_num(lhs) and not _is_num(rhs):
                # value OP key -> key FLIP(OP) value
                cmps.append(_Cmp(rhs, _FLIP[op], lhs))
            else:
                cmps.append(_Cmp(lhs, op, rhs))
        node = ("cmp", cmps[0])
        for c in cmps[1:]:
            node = ("and", node, ("cmp", c))
        return node

    def eval(self, info_str: str | None) -> bool:
        info = parse_info(info_str)
        return self._eval(self._ast, info)

    def _eval(self, node, info) -> bool:
        tag = node[0]
        if tag == "cmp":
            return node[1].eval(info)
        a = self._eval(node[1], info)
        if tag == "and":
            return a and self._eval(node[2], info)
        return a or self._eval(node[2], info)


def parse_info(info_str: str | None) -> dict[str, str | None]:
    """';'-delimited INFO column -> {key: value-or-None(flag)}."""
    if info_str is None or info_str == "." or info_str == "":
        return {}
    out: dict[str, str | None] = {}
    for part in str(info_str).split(";"):
        if not part:
            continue
        if "=" in part:
            k, v = part.split("=", 1)
            out[k] = v
        else:
            out[part] = None
    return out
