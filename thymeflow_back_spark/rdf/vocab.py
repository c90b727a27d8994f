"""Vocabulary constants: schema.org subset + engine-local namespace.

The reference models personal data with a schema.org subset plus its own
`personal:` namespace (SURVEY.md §1.3). We use public schema.org IRIs and an
engine-local `urn:personal:` namespace for the analogous concepts.
"""

SCHEMA = "http://schema.org/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

# classes
EMAIL_MESSAGE = SCHEMA + "EmailMessage"
PERSON = SCHEMA + "Person"
EVENT = SCHEMA + "Event"
PLACE = SCHEMA + "Place"
POSTAL_ADDRESS = SCHEMA + "PostalAddress"
GEO_COORDINATES = SCHEMA + "GeoCoordinates"

# properties
NAME = SCHEMA + "name"
EMAIL = SCHEMA + "email"
TELEPHONE = SCHEMA + "telephone"
URL = SCHEMA + "url"
SENDER = SCHEMA + "sender"
RECIPIENT = SCHEMA + "recipient"
CC_RECIPIENT = SCHEMA + "ccRecipient"
BCC_RECIPIENT = SCHEMA + "bccRecipient"
DATE_SENT = SCHEMA + "dateSent"
HEADLINE = SCHEMA + "headline"
TEXT = SCHEMA + "text"
START_DATE = SCHEMA + "startDate"
END_DATE = SCHEMA + "endDate"
DURATION = SCHEMA + "duration"
LOCATION = SCHEMA + "location"
ATTENDEE = SCHEMA + "attendee"
ORGANIZER = SCHEMA + "organizer"
BIRTH_DATE = SCHEMA + "birthDate"
GIVEN_NAME = SCHEMA + "givenName"
FAMILY_NAME = SCHEMA + "familyName"
ADDITIONAL_NAME = SCHEMA + "additionalName"
ADDRESS = SCHEMA + "address"
STREET_ADDRESS = SCHEMA + "streetAddress"
ADDRESS_LOCALITY = SCHEMA + "addressLocality"
ADDRESS_REGION = SCHEMA + "addressRegion"
ADDRESS_COUNTRY = SCHEMA + "addressCountry"
POSTAL_CODE = SCHEMA + "postalCode"
LATITUDE = SCHEMA + "latitude"
LONGITUDE = SCHEMA + "longitude"
GEO = SCHEMA + "geo"
CONTAINED_IN_PLACE = SCHEMA + "containedInPlace"
COUNTRY = SCHEMA + "Country"
HONORIFIC_PREFIX = SCHEMA + "honorificPrefix"
HONORIFIC_SUFFIX = SCHEMA + "honorificSuffix"
DEATH_DATE = SCHEMA + "deathDate"

# engine-local namespace (personal-information concepts with no schema.org IRI)
PERSONAL = "urn:personal:"
AGENT = PERSONAL + "Agent"
LOCATION_POINT = PERSONAL + "Location"
STAY = PERSONAL + "Stay"
EMAIL_ADDRESS = PERSONAL + "EmailAddress"
PHONE_NUMBER = PERSONAL + "PhoneNumber"
CELLPHONE_NUMBER = PERSONAL + "CellphoneNumber"
SAME_AS = PERSONAL + "sameAs"
DIFFERENT_FROM = PERSONAL + "differentFrom"
TIME = PERSONAL + "time"
UNCERTAINTY = PERSONAL + "uncertainty"
VELOCITY = PERSONAL + "velocity"
ANGLE = PERSONAL + "angle"
PRIMARY_FACET = PERSONAL + "primaryFacet"
DOCUMENT_OF = PERSONAL + "documentOf"

# service metadata tree (reference Supervisor.scala:63-94: the
# personal:serviceGraph holds Service → Account → Source, and every
# document graph is linked to its source with personal:documentOf)
SERVICE_GRAPH = PERSONAL + "serviceGraph"
SERVICE = PERSONAL + "Service"
SERVICE_ACCOUNT = PERSONAL + "ServiceAccount"
SERVICE_SOURCE = PERSONAL + "ServiceAccountSource"
ACCOUNT_OF = PERSONAL + "accountOf"
SOURCE_OF = PERSONAL + "sourceOf"
IN_REPLY_TO = PERSONAL + "inReplyTo"
NICKNAME = PERSONAL + "nickname"
