"""Crawl state: Bloom URL-seen filters, politeness/robots, frontier actors,
checkpoints."""
