"""Tree repair cost — the assess-stage capability (reference
``samples/menu/menu.py:287-294`` delegates to the external gotaglio
``Repair`` library, out of repo; this is an independent, documented cost
model with the same role: "how much editing turns tree A into tree B").

Cost model (each unit = one edit):
- primitive vs primitive: 0 if equal (strict: ``1 != True``), else 1
- dict vs dict: cost over the union of keys — missing key on either side
  costs the size of the present subtree; shared keys recurse
- list vs list: order-insensitive greedy min-cost matching (carts are
  bags of items); unmatched elements cost their size
- mismatched kinds: size(a) + size(b)

``size`` counts primitives + container slots, so replacing a whole
subtree costs proportionally to its weight.
"""

from __future__ import annotations


def tree_size(node) -> int:
    if isinstance(node, dict):
        return 1 + sum(tree_size(v) for v in node.values())
    if isinstance(node, list):
        return 1 + sum(tree_size(v) for v in node)
    return 1


def _prim_equal(a, b) -> bool:
    return a == b and type(a) is type(b)


def repair_cost(a, b) -> int:
    """Edit cost between two JSON trees; 0 iff structurally identical
    (with strict primitive typing)."""
    a_dict, b_dict = isinstance(a, dict), isinstance(b, dict)
    a_list, b_list = isinstance(a, list), isinstance(b, list)
    if a_dict and b_dict:
        cost = 0
        for k in a.keys() | b.keys():
            if k not in a:
                cost += tree_size(b[k])
            elif k not in b:
                cost += tree_size(a[k])
            else:
                cost += repair_cost(a[k], b[k])
        return cost
    if a_list and b_list:
        remaining = list(b)
        cost = 0
        for item in a:
            if not remaining:
                cost += tree_size(item)
                continue
            costs = [repair_cost(item, r) for r in remaining]
            best = min(range(len(costs)), key=costs.__getitem__)
            cost += costs[best]
            remaining.pop(best)
        cost += sum(tree_size(r) for r in remaining)
        return cost
    if a_dict or b_dict or a_list or b_list:
        return tree_size(a) + tree_size(b)
    return 0 if _prim_equal(a, b) else 1


class RepairCostStage:
    """Batch stage: cost between ``cart`` and ``expected`` JSON-string
    columns (the assess stage as a map over result rows)."""

    def __call__(self, batch):
        import json

        import pyarrow as pa
        costs = [repair_cost(json.loads(c), json.loads(e))
                 for c, e in zip(batch["cart"].to_pylist(),
                                 batch["expected"].to_pylist())]
        cols = {name: batch[name] for name in batch.column_names}
        cols["repair_cost"] = pa.array(costs, type=pa.int64())
        return pa.table(cols)
