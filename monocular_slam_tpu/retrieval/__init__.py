"""Place recognition: BoW vocabulary, scoring, loop detection."""
