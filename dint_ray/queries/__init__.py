"""Query operators: boolean AND/OR, ranked AND/OR, WAND, MaxScore."""
