; Kitchen-action domain for state (pre/post-condition) prediction.
; One operator per verb of the 33-verb EPIC subset used by the state
; experiments (configs asf-*state*.yaml). Format mirrors standard STRIPS
; PDDL with :negative-preconditions; the framework's parser
; (asf_tpu/state/pddl.py) grounds these to +/-1 attribute vectors.
(define (domain kitchen-actions)
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
        (attached ?x - object)
        (broken ?x - object)
        (cut ?x - object)
        (dry ?x - object)
        (wet ?x - object)
        (full ?x - object)
        (empty ?x - object)
        (flipped ?x - object)
        (folded ?x - object)
        (inserted ?x - object)
        (mixed ?x - object)
        (patted ?x - object)
        (peeled ?x - object)
        (pressed ?x - object)
        (ripped ?x - object)
        (scooped ?x - object)
        (scraped ?x - object)
        (shaken ?x - object)
        (squeezed ?x - object)
        (stretched ?x - object)
        (thrown ?x - object)
        (switched-on ?x - object)
        (clean ?x - object)
        (dirty ?x - object)
        (coated ?x - object)
        (added ?x - object)
    )

    (:action add
        :parameters (?x - object)
        :precondition (and (in-hand ?x) (not (added ?x)))
        :effect (added ?x)
    )

    (:action apply
        :parameters (?x - object)
        :precondition (and (in-hand ?x) (not (coated ?x)))
        :effect (coated ?x)
    )

    (:action attach
        :parameters (?x - object)
        :precondition (and (in-hand ?x) (not (attached ?x)))
        :effect (attached ?x)
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

    (:action empty
        :parameters (?x - object)
        :precondition (and (full ?x) (not (empty ?x)))
        :effect (and (empty ?x) (not (full ?x)))
    )

    (:action fill
        :parameters (?x - object)
        :precondition (and (empty ?x) (not (full ?x)))
        :effect (and (full ?x) (not (empty ?x)))
    )

    (:action flip
        :parameters (?x - object)
        :precondition (and (on-surface ?x) (not (flipped ?x)))
        :effect (flipped ?x)
    )

    (:action fold
        :parameters (?x - object)
        :precondition (and (in-hand ?x) (not (folded ?x)))
        :effect (folded ?x)
    )

    (:action hold
        :parameters (?x - object)
        :precondition (not (in-hand ?x))
        :effect (in-hand ?x)
    )

    (:action insert
        :parameters (?x - object)
        :precondition (and (in-hand ?x) (not (inserted ?x)))
        :effect (and (inserted ?x) (not (in-hand ?x)))
    )

    (:action mix
        :parameters (?x - object)
        :precondition (not (mixed ?x))
        :effect (mixed ?x)
    )

    (:action move
        :parameters (?x - object)
        :precondition (on-surface ?x)
        :effect (on-surface ?x)
    )

    (:action open
        :parameters (?x - object)
        :precondition (and (closed ?x) (not (opened ?x)))
        :effect (and (opened ?x) (not (closed ?x)))
    )

    (:action pat
        :parameters (?x - object)
        :precondition (not (patted ?x))
        :effect (patted ?x)
    )

    (:action peel
        :parameters (?x - object)
        :precondition (and (in-hand ?x) (not (peeled ?x)))
        :effect (peeled ?x)
    )

    (:action pour
        :parameters (?x - object)
        :precondition (and (in-hand ?x) (full ?x))
        :effect (and (empty ?x) (not (full ?x)))
    )

    (:action press
        :parameters (?x - object)
        :precondition (and (on-surface ?x) (not (pressed ?x)))
        :effect (pressed ?x)
    )

    (:action put
        :parameters (?x - object)
        :precondition (in-hand ?x)
        :effect (and (on-surface ?x) (not (in-hand ?x)))
    )

    (:action remove
        :parameters (?x - object)
        :precondition (and (inserted ?x) (not (in-hand ?x)))
        :effect (and (in-hand ?x) (not (inserted ?x)))
    )

    (:action rip
        :parameters (?x - object)
        :precondition (and (in-hand ?x) (not (ripped ?x)))
        :effect (ripped ?x)
    )

    (:action scoop
        :parameters (?x - object)
        :precondition (not (scooped ?x))
        :effect (scooped ?x)
    )

    (:action scrape
        :parameters (?x - object)
        :precondition (not (scraped ?x))
        :effect (scraped ?x)
    )

    (:action shake
        :parameters (?x - object)
        :precondition (and (in-hand ?x) (not (shaken ?x)))
        :effect (and (shaken ?x) (in-hand ?x))
    )

    (:action squeeze
        :parameters (?x - object)
        :precondition (and (in-hand ?x) (not (squeezed ?x)))
        :effect (squeezed ?x)
    )

    (:action stretch
        :parameters (?x - object)
        :precondition (and (in-hand ?x) (not (stretched ?x)))
        :effect (stretched ?x)
    )

    (:action take
        :parameters (?x - object)
        :precondition (and (on-surface ?x) (not (in-hand ?x)))
        :effect (and (in-hand ?x) (not (on-surface ?x)))
    )

    (:action throw
        :parameters (?x - object)
        :precondition (and (in-hand ?x) (not (thrown ?x)))
        :effect (and (thrown ?x) (not (in-hand ?x)))
    )

    (:action turn-off
        :parameters (?x - object)
        :precondition (switched-on ?x)
        :effect (not (switched-on ?x))
    )

    (:action turn-on
        :parameters (?x - object)
        :precondition (not (switched-on ?x))
        :effect (switched-on ?x)
    )

    (:action wash
        :parameters (?x - object)
        :precondition (and (dirty ?x) (not (clean ?x)))
        :effect (and (clean ?x) (wet ?x) (not (dirty ?x)))
    )
)
