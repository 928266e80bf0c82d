; Dummy grounding problem — only supplies objects so the domain parses;
; the state pipeline never plans (asf_tpu/state/pddl.py).
(define (problem kitchen-actions-template)
    (:domain kitchen-actions)
    (:objects
        a - object
        b - object
        c - object
    )
    (:init)
    (:goal (and (opened a) (closed a)))
)
