"""ML layer: dataset preparation, MLlib RandomForest QPE, bias
correction, event-based cross-validation (SURVEY §7 Phases 2-3)."""
