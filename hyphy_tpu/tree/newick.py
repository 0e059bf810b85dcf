"""Newick parsing with HyPhy extensions.

Accepts the reference dialect (``src/core/topology.cpp:292``
``MainTreeConstructor``): branch lengths, quoted names, ``{MODEL}`` branch
annotations, comments in ``[...]``, and multifurcations.  Unnamed internal
nodes are named ``Node<k>`` where ``k`` is the preorder index of the node's
opening parenthesis (root = 0) — required for branch-name parity with the
reference's JSON output.
"""

from __future__ import annotations

from typing import List, Optional


class ParseNode:
    __slots__ = ("name", "children", "length", "label", "parent")

    def __init__(self):
        self.name: str = ""
        self.children: List["ParseNode"] = []
        self.length: Optional[float] = None
        self.label: Optional[str] = None
        self.parent: Optional["ParseNode"] = None

    @property
    def is_leaf(self) -> bool:
        return not self.children


def parse_newick(text: str, internal_prefix: str = "Node") -> ParseNode:
    s = text.strip()
    if s.endswith(";"):
        s = s[:-1]
    pos = 0
    n = len(s)
    paren_counter = 0

    def skip_ws():
        nonlocal pos
        while pos < n:
            if s[pos] in " \t\r\n":
                pos += 1
            elif s[pos] == "[":  # comment
                depth = 1
                pos += 1
                while pos < n and depth:
                    if s[pos] == "[":
                        depth += 1
                    elif s[pos] == "]":
                        depth -= 1
                    pos += 1
            else:
                return

    def read_name() -> str:
        nonlocal pos
        skip_ws()
        if pos < n and s[pos] in "'\"":
            quote = s[pos]
            pos += 1
            start = pos
            while pos < n and s[pos] != quote:
                pos += 1
            name = s[start:pos]
            pos += 1  # closing quote
            return name
        start = pos
        while pos < n and s[pos] not in "(),:;{}[ \t\r\n":
            pos += 1
        return s[start:pos]

    def read_annotations(node: ParseNode):
        """Optional {label} and :length, in either order."""
        nonlocal pos
        while True:
            skip_ws()
            if pos < n and s[pos] == "{":
                end = s.index("}", pos)
                node.label = s[pos + 1 : end]
                pos = end + 1
            elif pos < n and s[pos] == ":":
                pos += 1
                skip_ws()
                start = pos
                while pos < n and (s[pos] in "+-.eE0123456789"):
                    pos += 1
                node.length = float(s[start:pos])
            else:
                return

    def subtree() -> ParseNode:
        nonlocal pos, paren_counter
        skip_ws()
        node = ParseNode()
        if pos < n and s[pos] == "(":
            my_number = paren_counter
            paren_counter += 1
            pos += 1
            while True:
                child = subtree()
                child.parent = node
                node.children.append(child)
                skip_ws()
                if pos < n and s[pos] == ",":
                    pos += 1
                    continue
                if pos < n and s[pos] == ")":
                    pos += 1
                    break
                raise ValueError(f"newick parse error at {pos}: {s[max(0,pos-20):pos+20]!r}")
            node.name = read_name()
            if not node.name:
                node.name = f"{internal_prefix}{my_number}"
        else:
            node.name = read_name()
            if not node.name:
                raise ValueError(f"empty leaf name at {pos}")
        read_annotations(node)
        return node

    root = subtree()
    skip_ws()
    if pos < n:
        raise ValueError(f"trailing characters in newick at {pos}: {s[pos:pos+30]!r}")
    return root
