"""Record sinks: INSPIRE restructuring select + JSON writers
(SURVEY.md §2.8 K1/K2/K6)."""
