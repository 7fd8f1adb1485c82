"""XML payload parsing — the ``xml_to_dict`` analog.

The reference transforms XML page payloads with lxml+XSLT
(``dd_core/src/dd_core/mapper/misc.py:218-242``); lxml is absent here, so a
stdlib ``xml.etree`` walk produces the same nested-dict shape. Used as a
stateless ``map_batches`` parse stage for XML transcript payloads.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET


def xml_to_dict(payload: str) -> dict:
    """Parse an XML string into ``{tag, attrib, text, children}`` recursively."""
    return _node_to_dict(ET.fromstring(payload))


def _node_to_dict(node: ET.Element) -> dict:
    return {
        "tag": node.tag,
        "attrib": dict(node.attrib),
        "text": (node.text or "").strip(),
        "children": [_node_to_dict(c) for c in node],
    }


def xml_block_texts(payload: str) -> list[str]:
    """Flatten an XML document into leaf text blocks in document order."""
    out: list[str] = []

    def walk(node: ET.Element) -> None:
        text = (node.text or "").strip()
        if text and len(node) == 0:
            out.append(text)
        for child in node:
            walk(child)
            tail = (child.tail or "").strip()
            if tail:
                out.append(tail)

    walk(ET.fromstring(payload))
    return out
