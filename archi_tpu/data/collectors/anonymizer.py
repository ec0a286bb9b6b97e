"""Anonymizer: scrub personal data from ticket text before indexing.

Mirrors the reference's ``Anonymizer``
(``src/data_manager/collectors/utils/anonymizer.py:13``), which combines
spaCy NER with regexes.  spaCy is not in this image, so this implementation
covers the regex classes (emails, phone numbers, user handles, salutation
names) deterministically.
"""

from __future__ import annotations

import re

_EMAIL = re.compile(r"[\w.+-]+@[\w-]+\.[\w.-]+")
_PHONE = re.compile(r"(?<!\d)(?:\+?\d{1,3}[ .-]?)?(?:\(\d{2,4}\)[ .-]?)?\d{3,4}[ .-]\d{3,4}(?:[ .-]\d{2,4})?(?!\d)")
_HANDLE = re.compile(r"(?<!\w)@[A-Za-z0-9_]{2,}")
_SALUTATION = re.compile(
    r"\b(?:Dear|Hi|Hello|Regards|Thanks|Best|Cheers|Sincerely)[ ,]+"
    r"([A-Z][a-z]+(?: [A-Z][a-z]+)?)\b"
)


class Anonymizer:
    def __init__(self, placeholder: str = "[REDACTED]"):
        self.placeholder = placeholder

    def anonymize(self, text: str) -> str:
        text = _EMAIL.sub(self.placeholder, text)
        text = _PHONE.sub(self.placeholder, text)
        text = _HANDLE.sub(self.placeholder, text)
        text = _SALUTATION.sub(
            lambda m: m.group(0).replace(m.group(1), self.placeholder), text
        )
        return text
