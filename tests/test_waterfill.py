"""Property test for the q208 closed-form integer waterfill: the
prefix-sum pivot construction must agree with brute-force cap
enumeration on random instances, and the allocation must satisfy the
max-min-fairness characterization."""

from hypothesis import given, settings
from hypothesis import strategies as st


def _waterfill_brute(counts, budget):
    total = sum(counts)
    if total <= budget:
        return list(counts)
    cap = max(c for c in range(0, max(counts) + 1)
              if sum(min(n, c) for n in counts) <= budget)
    q = [min(n, cap) for n in counts]
    r = budget - sum(q)
    for i in range(len(counts)):  # remainder to lowest ids with n > cap
        if r == 0:
            break
        if counts[i] > cap:
            q[i] += 1
            r -= 1
    return q


def _waterfill_closed(counts, budget):
    """Pure-Python mirror of the q208 plan: sorted prefix-sum levels,
    pivot = last level with fill <= budget, arithmetic cap extension."""
    n_src = len(counts)
    total = sum(counts)
    order = sorted(range(n_src), key=lambda s: (counts[s], s))
    levels = [(0, 0, 0)]  # (i, n_i, prefix)
    p = 0
    for i, s in enumerate(order, start=1):
        p += counts[s]
        levels.append((i, counts[s], p))
    if total <= budget:
        cap, r = max(counts), 0
    else:
        best = max(
            (i, n_i, p) for (i, n_i, p) in levels
            if p + n_i * (n_src - i) <= budget
        )
        i, n_i, p = best
        fill = p + n_i * (n_src - i)
        slots = max(n_src - i, 1)
        cap = n_i + (budget - fill) // slots
        r = (budget - fill) % slots
    q = [min(n, cap) for n in counts]
    for i in range(n_src):
        if r == 0:
            break
        if counts[i] > cap:
            q[i] += 1
            r -= 1
    return q


@settings(max_examples=300, deadline=None)
@given(
    counts=st.lists(st.integers(0, 500), min_size=1, max_size=25),
    budget=st.integers(0, 6000),
)
def test_closed_form_matches_brute_force(counts, budget):
    if max(counts, default=0) == 0:
        return  # empty corpus: both allocate zero trivially
    a = _waterfill_brute(counts, budget)
    b = _waterfill_closed(counts, budget)
    assert a == b, (counts, budget, a, b)
    # characterization: total, caps, max-min fairness
    assert sum(a) == min(budget, sum(counts))
    assert all(0 <= qi <= ni for qi, ni in zip(a, counts))
    # max-min fairness: all capped (unsaturated) sources sit within 1
    # of each other, and nothing exceeds the capped level + 1
    unsat = [qi for qi, ni in zip(a, counts) if qi < ni]
    if unsat:
        assert max(unsat) - min(unsat) <= 1
        assert all(qi <= max(unsat) + 1 or qi == ni
                   for qi, ni in zip(a, counts))
