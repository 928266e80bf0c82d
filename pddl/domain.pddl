; Compact kitchen-action domain (subset of full_domain.pddl) used by the
; default state configs; same format, fewer operators.
(define (domain kitchen-actions-small)
    (:requirements :strips :typing :negative-preconditions)
    (:types
        object hand recipient - object
        tool - object
    )

    (:predicates
        (in-hand ?x - object)
        (on-surface ?x - object)
        (opened ?x - object)
        (closed ?x - object)
        (broken ?x - object)
        (cut ?x - object)
        (dry ?x - object)
        (wet ?x - object)
        (full ?x - object)
        (empty ?x - object)
        (shaken ?x - object)
        (clean ?x - object)
        (dirty ?x - object)
    )

    (:action break
        :parameters (?x - object)
        :precondition (and (in-hand ?x) (not (broken ?x)))
        :effect (broken ?x)
    )

    (:action close
        :parameters (?x - object)
        :precondition (and (opened ?x) (not (closed ?x)))
        :effect (and (closed ?x) (not (opened ?x)))
    )

    (:action cut
        :parameters (?x - object)
        :precondition (and (on-surface ?x) (not (cut ?x)))
        :effect (cut ?x)
    )

    (:action dry
        :parameters (?x - object)
        :precondition (and (wet ?x) (not (dry ?x)))
        :effect (and (dry ?x) (not (wet ?x)))
    )

    (:action fill
        :parameters (?x - object)
        :precondition (and (empty ?x) (not (full ?x)))
        :effect (and (full ?x) (not (empty ?x)))
    )

    (:action open
        :parameters (?x - object)
        :precondition (and (closed ?x) (not (opened ?x)))
        :effect (and (opened ?x) (not (closed ?x)))
    )

    (:action shake
        :parameters (?x - object)
        :precondition (and (in-hand ?x) (not (shaken ?x)))
        :effect (and (shaken ?x) (in-hand ?x))
    )

    (:action wash
        :parameters (?x - object)
        :precondition (and (dirty ?x) (not (clean ?x)))
        :effect (and (clean ?x) (wet ?x) (not (dirty ?x)))
    )
)
