"""Pure, deterministic per-row kernels.  No Ray imports here — these
functions define the golden byte-identity contract and are unit-tested
directly (SURVEY.md §5)."""
