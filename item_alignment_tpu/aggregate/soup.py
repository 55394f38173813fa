"""Model soup: uniform (element-wise average) weight averaging.

The reference sums N epoch checkpoints' parameter tensors and divides
(``model_soup_text.py:226-251``; non-parameter buffers are kept from the
last checkpoint).  As a pytree op this is a one-line ``tree_map`` and runs
on-device.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def uniform_soup(param_trees: Sequence[Any],
                 include: Optional[Callable[[tuple], bool]] = None) -> Any:
    """Average a list of identical-structure param pytrees.

    ``include(path) -> bool`` optionally restricts averaging to a subset of
    leaves (the reference averages only ``named_parameters`` and passes
    buffers through); excluded leaves come from the LAST tree.
    """
    assert len(param_trees) > 0
    if len(param_trees) == 1:
        return param_trees[0]
    n = float(len(param_trees))

    if include is None:
        return jax.tree_util.tree_map(
            lambda *leaves: sum(leaves[1:], leaves[0]) / n, *param_trees)

    def avg(path, *leaves):
        if include(path):
            return sum(leaves[1:], leaves[0]) / n
        return leaves[-1]

    return jax.tree_util.tree_map_with_path(avg, *param_trees)


def greedy_soup(param_trees: Sequence[Any], score_fn: Callable[[Any], float]
                ) -> Any:
    """Greedy soup (Wortsman et al.): add checkpoints in best-first order,
    keep each only if the running average improves ``score_fn``.  The
    reference only ships uniform soup; greedy is the standard upgrade."""
    scored = sorted(param_trees, key=score_fn, reverse=True)
    soup = [scored[0]]
    best = score_fn(scored[0])
    for tree in scored[1:]:
        candidate = uniform_soup(soup + [tree])
        s = score_fn(candidate)
        if s >= best:
            soup.append(tree)
            best = s
    return uniform_soup(soup)
