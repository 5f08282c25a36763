"""Source front-ends: convert raw document bytes into the corpus span encoding."""
