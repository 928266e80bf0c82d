"""PDDL vectorisation tests — mirrors /root/reference/src/test_pddl.py:45-72
(round-trip + exact vectors) and parses the reference's real domain files."""

import numpy as np

from asf_tpu.state.pddl import Action, Predicate, parse_pddl


def test_vectorize_example():
    action = Action(
        name="throw",
        preconditions=[
            Predicate(attribute="in-hand", value=True),
            Predicate(attribute="thrown", value=False),
        ],
        postconditions=[
            Predicate(attribute="thrown", value=True),
            Predicate(attribute="in-hand", value=False),
        ],
    )
    pre, post = action.vectorize(["in-hand", "sharp", "thrown"])
    np.testing.assert_array_equal(pre, [1.0, 0.0, -1.0])
    np.testing.assert_array_equal(post, [-1.0, 0.0, 1.0])


def test_roundtrip_predicates_from_vector():
    attrs = ["a", "b", "c", "d"]
    vec = np.array([1.0, -1.0, 0.0, 1.0], np.float32)
    preds = Predicate.predicates_from_vector(vec, attrs)
    assert preds == [
        Predicate("a", True),
        Predicate("b", False),
        Predicate("d", True),
    ]
    strs = Predicate.predicates_from_vector(vec, attrs, to_str=True)
    assert strs == ["a", "not-b", "d"]


def test_parse_reference_domain():
    actions, attributes = parse_pddl(
        "/root/reference/pddl/domain.pddl", "/root/reference/pddl/problem.pddl"
    )
    assert len(actions) == 8
    names = {a.name for a in actions}
    assert {"break", "crush", "pat", "shake", "throw"} <= names
    assert attributes == sorted(attributes)
    assert "in-hand" in attributes and "broken" in attributes

    brk = next(a for a in actions if a.name == "break")
    assert Predicate("in-hand", True) in brk.preconditions
    assert Predicate("broken", False) in brk.preconditions
    assert Predicate("broken", True) in brk.postconditions

    # vectors over the domain's attribute set
    pre, post = brk.vectorize(attributes)
    assert pre[attributes.index("in-hand")] == 1
    assert pre[attributes.index("broken")] == -1
    assert post[attributes.index("broken")] == 1


def test_parse_full_domain():
    actions, attributes = parse_pddl("/root/reference/pddl/full_domain.pddl")
    assert len(actions) == 33
    assert len(attributes) > 10
