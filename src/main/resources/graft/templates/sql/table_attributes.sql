-- Storage attributes of every table in the admin schema (analog of
-- the reference's table_attributes.sql over svv_table_info)
SHOW TABLE EXTENDED IN ${graft_settings.admin_schema} LIKE '*';
