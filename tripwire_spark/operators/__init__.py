"""Engine operators: frontier state machine, crawl rounds, seen-set,
dedup family, similarity search, text analytics (SURVEY.md §2)."""
