"""Operator library — the SURVEY.md §2 inventory re-expressed as DataFrame→DataFrame
transforms. Every operator is declarative (joins/windows/set-algebra) so Catalyst picks
the physical strategy; nothing here collects to the driver or loops per group."""
